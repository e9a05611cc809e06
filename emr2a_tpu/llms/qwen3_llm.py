"""Qwen3-VL chat LLM on the JAX generation backend.

Capability parity with the reference's Qwen3LLM (llms/qwen3_llm.py):
chat-template messages with inline images, temperature>0 toggles
sampling, generate/generate_batch/chat surface.  Generation runs
through the judge backend (judge/qwen_backend.py — JAX Qwen3-VL), not
torch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from emr2a_tpu.llms.base import BaseLLM


class Qwen3LLM(BaseLLM):

    def __init__(self, model_path: str, device: str = "tpu",
                 dtype: str = "bfloat16", backend=None):
        super().__init__(device)
        self.model_path = model_path
        self.dtype = dtype
        if backend is None:
            from emr2a_tpu.judge.backends import load_backend
            backend = load_backend(model_path, device)
        if backend is None:
            raise RuntimeError(f"Failed to load Qwen3-VL from {model_path}")
        self.backend = backend

    def generate(self, prompt, images=None, max_new_tokens=512,
                 temperature=0.2, top_p=0.9, **kwargs) -> str:
        return self.backend.generate(
            images or [], prompt, max_new_tokens=max_new_tokens,
            temperature=temperature)

    def generate_batch(self, prompts, images_list=None, max_new_tokens=512,
                       temperature=0.2, top_p=0.9, **kwargs) -> List[str]:
        return [self.generate(
                    p, images_list[i] if images_list else None,
                    max_new_tokens, temperature, top_p, **kwargs)
                for i, p in enumerate(prompts)]

    def chat(self, messages: List[Dict[str, Union[str, List[Dict]]]],
             max_new_tokens=512, temperature=0.2, top_p=0.9, **kwargs) -> str:
        """Flatten chat messages into (images, prompt, system) for the
        backend; the backend applies the model's chat template."""
        system = None
        images: List = []
        text_parts: List[str] = []
        for msg in messages:
            content = msg.get("content")
            if msg.get("role") == "system":
                system = content if isinstance(content, str) else str(content)
                continue
            if isinstance(content, str):
                text_parts.append(content)
                continue
            for item in content or []:
                if item.get("type") == "text":
                    text_parts.append(item.get("text", ""))
                elif item.get("type") == "image":
                    images.append(item.get("image"))
        return self.backend.generate(
            images, "\n".join(text_parts), system=system,
            max_new_tokens=max_new_tokens, temperature=temperature)
