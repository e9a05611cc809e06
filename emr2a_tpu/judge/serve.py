"""JSONL judge serving CLI — a standalone continuous-batching service.

The reference has no serving entry point at all: every VLM call
happens inside a pipeline loop, strictly one case at a time
(/root/reference/pipelines/step4_vlm_review/vlm_audit_module.py:651-
734).  This CLI turns the judge stack into a service a user can run
directly:

    python -m emr2a_tpu.judge.serve \
        --model_path /ckpts/qwen3-vl-8b --precision int8 \
        --input requests.jsonl --output responses.jsonl [--follow]

It reads request lines from a JSONL file, serves them through
slot-based continuous batching (models/serving.ContinuousBatcher via
``QwenVLBackend.generate_stream``) with per-request sampling, and
appends one response line per request to the output file.  With
``--follow`` it keeps tailing the input for new lines (a file-based
request queue — no sockets needed), serving each new wave as it
arrives; stop it with SIGINT or by writing a ``{"cmd": "shutdown"}``
line.

Request line schema (only ``prompt`` is required):

    {"id": "r1", "prompt": "...", "images": ["/path/a.png", ...],
     "system": "...", "temperature": 0.0, "top_p": 0.9, "seed": 1,
     "max_new_tokens": 512}

Response line: ``{"id": ..., "output": "...", "ok": true}`` or
``{"id": ..., "ok": false, "error": "..."}`` — a request that fails to
load never crashes the wave (skip-and-continue, the reference's
failure semantics throughout).
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from emr2a_tpu.judge.backends import VLMBackend, load_backend

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s - %(levelname)s - %(message)s")
logger = logging.getLogger(__name__)


def parse_request_line(line: str, lineno: int) -> Tuple[Optional[Dict],
                                                        Optional[Dict]]:
    """Returns (request, None) or (None, error_response); blank lines
    yield (None, None)."""
    line = line.strip()
    if not line:
        return None, None
    try:
        req = json.loads(line)
    except json.JSONDecodeError as e:
        return None, {"id": f"line_{lineno}", "ok": False,
                      "error": f"invalid JSON: {e}"}
    if not isinstance(req, dict):
        return None, {"id": f"line_{lineno}", "ok": False,
                      "error": "request must be a JSON object"}
    if req.get("cmd") == "shutdown":
        return req, None
    if not req.get("prompt"):
        return None, {"id": req.get("id", f"line_{lineno}"), "ok": False,
                      "error": "missing 'prompt'"}
    req.setdefault("id", f"line_{lineno}")
    return req, None


def load_request(req: Dict) -> Tuple[Optional[Dict], Optional[Dict]]:
    """Resolve image paths into PIL images; (backend_request, None) or
    (None, error_response)."""
    from PIL import Image

    images = []
    for path in req.get("images", []) or []:
        p = Path(path)
        if not p.exists():
            return None, {"id": req["id"], "ok": False,
                          "error": f"image not found: {path}"}
        try:
            images.append(Image.open(p).convert("RGB"))
        except Exception as e:  # skip-and-continue per request
            return None, {"id": req["id"], "ok": False,
                          "error": f"failed to load {path}: {e}"}
    backend_req = {"images": images, "prompt": req["prompt"],
                   "system": req.get("system")}
    for key in ("temperature", "top_p", "seed", "max_new_tokens"):
        if req.get(key) is not None:
            backend_req[key] = req[key]
    return backend_req, None


def serve_wave(backend: VLMBackend, requests: List[Dict],
               max_new_tokens: int, n_slots: int) -> List[Dict]:
    """One wave: resolve, stream, and map back to response lines in
    input order."""
    responses: List[Optional[Dict]] = [None] * len(requests)
    ready: List[Tuple[int, Dict]] = []
    for i, req in enumerate(requests):
        backend_req, err = load_request(req)
        if err is not None:
            responses[i] = err
        else:
            ready.append((i, backend_req))
    if ready:
        try:
            if hasattr(backend, "generate_stream"):
                outputs = backend.generate_stream(
                    [r for _, r in ready], max_new_tokens=max_new_tokens,
                    n_slots=n_slots)
            else:  # fall back to the static batched protocol
                outputs = backend.generate_batch(
                    [r for _, r in ready], max_new_tokens=max_new_tokens)
            for (i, _), out in zip(ready, outputs):
                responses[i] = {"id": requests[i]["id"], "output": out,
                                "ok": True}
        except Exception as e:
            # one poisoned request must not kill the service: retry the
            # wave one request at a time so only the bad ones fail
            logger.error("Wave failed (%s); retrying per-request", e)
            for i, backend_req in ready:
                try:
                    out = backend.generate(
                        backend_req["images"], backend_req["prompt"],
                        system=backend_req.get("system"),
                        max_new_tokens=max_new_tokens,
                        temperature=float(
                            backend_req.get("temperature") or 0.0))
                    responses[i] = {"id": requests[i]["id"],
                                    "output": out, "ok": True}
                except Exception as e2:
                    responses[i] = {"id": requests[i]["id"], "ok": False,
                                    "error": f"generation failed: {e2}"}
    return [r for r in responses if r is not None]


def run(input_path: Path, output_path: Path, backend: VLMBackend,
        max_new_tokens: int = 1024, n_slots: int = 8,
        follow: bool = False, poll: float = 0.5) -> int:
    """Main loop; returns the number of requests served.  In --follow
    mode the input file is a request queue: each poll serves every
    line appended since the last wave."""
    served = 0
    offset = 0
    lineno = 0
    while True:
        lines: List[str] = []
        if input_path.exists():
            # binary read + byte offsets: text-mode newline translation
            # would make the offset bookkeeping undercount CRLF files,
            # and str.splitlines() would split on U+2028/U+2029, which
            # are legal unescaped inside JSON strings
            with input_path.open("rb") as f:
                f.seek(offset)
                chunk = f.read()
            # a --follow poll can catch a line mid-write: consume only
            # newline-terminated lines, leave the partial tail for the
            # next poll (one-shot mode reads the file after the writer
            # is done, so a missing final newline is a complete line)
            if follow and chunk and not chunk.endswith(b"\n"):
                cut = chunk.rfind(b"\n") + 1
                chunk = chunk[:cut]
            offset += len(chunk)
            lines = [raw.decode("utf-8", errors="replace")
                     for raw in chunk.split(b"\n")]
        requests, errors, shutdown = [], [], False
        for line in lines:
            lineno += 1
            req, err = parse_request_line(line, lineno)
            if err is not None:
                errors.append(err)
            elif req is not None:
                if req.get("cmd") == "shutdown":
                    shutdown = True
                    break
                requests.append(req)
        if requests or errors:
            t0 = time.time()
            responses = errors + serve_wave(backend, requests,
                                            max_new_tokens, n_slots)
            wave_s = round(time.time() - t0, 3)
            with output_path.open("a", encoding="utf-8") as f:
                for resp in responses:
                    # wave-level observability: how long this wave took
                    # and how many requests shared it
                    resp.setdefault("wave_s", wave_s)
                    resp.setdefault("wave_size", len(requests))
                    f.write(json.dumps(resp, ensure_ascii=False) + "\n")
            served += len(requests)
            logger.info("Served %d requests (%d failed) in %.2fs "
                        "(%d total)", len(requests),
                        sum(1 for r in responses if not r.get("ok")),
                        time.time() - t0, served)
        if shutdown or not follow:
            break
        time.sleep(poll)
    return served


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Continuous-batching JSONL judge service")
    parser.add_argument("--model_path", required=True,
                        help="Qwen3-VL checkpoint dir, or 'fake' for "
                             "the scripted backend")
    parser.add_argument("--input", required=True,
                        help="request JSONL (tailed with --follow)")
    parser.add_argument("--output", required=True,
                        help="response JSONL (appended)")
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--n_slots", type=int, default=8)
    parser.add_argument("--max_new_tokens", type=int, default=1024)
    parser.add_argument("--precision", default="bf16",
                        choices=["bf16", "int8", "int4"],
                        help="int8 = W8A8, accuracy-safe; int4 = W4A8, "
                             "EXPERIMENTAL (real RTN accuracy cost — "
                             "validate before trusting outputs)")
    parser.add_argument("--kv_cache", default="bf16",
                        choices=["bf16", "int8"])
    parser.add_argument("--draft_model", default=None,
                        help="small same-vocabulary draft checkpoint: "
                             "all-greedy waves serve through "
                             "speculative continuous batching "
                             "(lossless draft-k/verify-1 cycles per "
                             "slot)")
    parser.add_argument("--spec_k", type=int, default=4)
    parser.add_argument("--prefill_chunk", type=int, default=None,
                        help="sequence-chunked prompt prefill (C tokens "
                             "per pass, bit-identical output) — needed "
                             "for long prompt buckets / large batches")
    parser.add_argument("--follow", action="store_true",
                        help="keep tailing --input for new requests")
    parser.add_argument("--poll", type=float, default=0.5,
                        help="seconds between --follow polls")
    return parser


def main(argv=None, backend: Optional[VLMBackend] = None) -> None:
    args = build_parser().parse_args(argv)
    if backend is None:
        backend = load_backend(args.model_path, device=args.device,
                               precision=args.precision,
                               kv_dtype=args.kv_cache,
                               draft_model_path=args.draft_model,
                               spec_k=args.spec_k,
                               prefill_chunk=args.prefill_chunk)
    if backend is None:
        raise SystemExit(f"could not load backend from {args.model_path}")
    served = run(Path(args.input), Path(args.output), backend,
                 max_new_tokens=args.max_new_tokens, n_slots=args.n_slots,
                 follow=args.follow, poll=args.poll)
    logger.info("Done: %d requests -> %s", served, args.output)


if __name__ == "__main__":
    main()
