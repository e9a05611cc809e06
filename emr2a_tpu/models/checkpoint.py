"""Local checkpoint loading (torch .bin / safetensors) + Orbax save/restore.

The reference loads local checkpoint files directly (e.g.
encoders/clip_encoder.py:25-36 manual ``pytorch_model.bin`` state_dict
load; biomedclip_encoder.py:29-35 ``open_clip_pytorch_model.bin``).
This module resolves the same file layouts and hands numpy state dicts
to models/convert.py; converted flax params can be cached as Orbax
checkpoints so later runs skip torch entirely.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import numpy as np

_TORCH_NAMES = ("pytorch_model.bin", "open_clip_pytorch_model.bin", "model.bin")
_SAFETENSOR_NAMES = ("model.safetensors",)


def load_state_dict(model_path) -> Dict[str, np.ndarray]:
    """Load a torch/safetensors state dict from a file or HF-style dir."""
    path = Path(model_path)
    if path.is_dir():
        for name in _SAFETENSOR_NAMES:
            if (path / name).exists():
                return _load_safetensors(path / name)
        shards = sorted(path.glob("*.safetensors"))
        if shards:
            out: Dict[str, np.ndarray] = {}
            for s in shards:
                out.update(_load_safetensors(s))
            return out
        for name in _TORCH_NAMES:
            if (path / name).exists():
                return _load_torch(path / name)
        shards = sorted(path.glob("pytorch_model-*.bin"))
        if shards:
            out = {}
            for s in shards:
                out.update(_load_torch(s))
            return out
        raise FileNotFoundError(f"No checkpoint file found under {path}")
    if path.suffix == ".safetensors":
        return _load_safetensors(path)
    return _load_torch(path)


def _load_safetensors(path: Path) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    out = {}
    with safe_open(str(path), framework="numpy") as f:
        for k in f.keys():
            out[k] = f.get_tensor(k)
    return out


def _load_torch(path: Path) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    for wrapper in ("state_dict", "model", "model_state", "model_state_dict"):
        if wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
            break
    return {k: v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy()
            for k, v in sd.items()}


def save_params(params, directory) -> None:
    """Cache converted flax params as an Orbax checkpoint."""
    import orbax.checkpoint as ocp
    path = Path(directory).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params)
    ckptr.wait_until_finished()


def restore_params(directory):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(directory).absolute())


def _weights_fingerprint(ckpt_dir: Path) -> str:
    weights = sorted(list(ckpt_dir.glob("*.safetensors"))
                     + list(ckpt_dir.glob("*.bin"))
                     + list(ckpt_dir.glob("*.pt")))
    return json.dumps([(w.name, w.stat().st_size, int(w.stat().st_mtime))
                       for w in weights])


def _cache_stale(ckpt_dir: Path, cache_dir: Path) -> bool:
    """True unless the stamp written at conversion time matches the
    current weight files (name/size/mtime) — catches swapped weights
    even when the replacement's mtime predates the cache (tar/rsync
    preserve mtimes)."""
    try:
        stamp = (cache_dir / "weights_stamp.json").read_text()
        return stamp != _weights_fingerprint(ckpt_dir)
    except OSError:
        return True


def load_or_convert(model_path, convert_fn, cache_name: str = "emr2a_flax"):
    """Converted-params cache beside the checkpoint: the first load
    torch-converts and writes an Orbax checkpoint; later loads skip
    torch entirely (matters for the 8B judge, where torch.load alone
    costs minutes).

    convert_fn(state_dict) -> flax params; the cache directory name
    includes the converter's name, so two converters pointed at the
    same checkpoint dir never reuse each other's params.
    """
    path = Path(model_path)
    fn_name = getattr(convert_fn, "__name__", "convert")
    cache_dir = path / f"{cache_name}.{fn_name}.orbax"
    if cache_dir.exists() and not _cache_stale(path, cache_dir):
        try:
            return restore_params(cache_dir)
        except Exception:
            pass  # fall through to reconversion
    params = convert_fn(load_state_dict(path))
    try:
        if cache_dir.exists():
            import shutil
            shutil.rmtree(cache_dir)  # orbax refuses to overwrite
        save_params(params, cache_dir)
        (cache_dir / "weights_stamp.json").write_text(
            _weights_fingerprint(path))
    except Exception:
        pass  # read-only checkpoint dirs: conversion still works
    return params


def load_qwen3_vl(model_path, config=None, params=None,
                  cache_params: bool = True):
    """(config, params) for a Qwen3-VL checkpoint directory, through
    the Orbax converted-params cache (the 8B judge's torch.load +
    convert costs minutes; restore does not).  The ONE bring-up recipe
    shared by the judge backend and the hidden-state-tap encoder —
    tokenizer/image-processor policies stay per-caller."""
    if params is None:
        import json as _json
        from pathlib import Path as _Path

        from emr2a_tpu.models.qwen3_vl import (convert_hf_qwen3_vl,
                                               qwen3_vl_config_from_hf)
        mp = _Path(model_path)
        with (mp / "config.json").open() as f:
            hf_cfg = _json.load(f)
        config = qwen3_vl_config_from_hf(hf_cfg)

        def convert_qwen3_vl(sd):
            return convert_hf_qwen3_vl(
                sd, config.vision.depth, config.text.num_layers)

        if cache_params:
            params = load_or_convert(mp, convert_qwen3_vl)
        else:
            params = convert_qwen3_vl(load_state_dict(mp))
    return config, params
