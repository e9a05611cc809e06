"""The JSONL judge service (emr2a_tpu.judge.serve): one-shot waves,
skip-and-continue error lines, per-request sampling threading, and the
--follow request-queue loop with shutdown."""

import json
import threading
import time

import numpy as np
from PIL import Image

from emr2a_tpu.judge.backends import FakeVLMBackend
from emr2a_tpu.judge.serve import main as serve_main, run


def _write_img(path):
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(path)


def test_serve_one_shot(tmp_path):
    img = tmp_path / "a.png"
    _write_img(img)
    rows = [
        json.dumps({"id": "a", "prompt": "p1", "images": [str(img)]}),
        "not json at all {",
        json.dumps({"id": "b", "prompt": "p2", "temperature": 0.7,
                    "seed": 3}),
        json.dumps({"id": "c", "images": [str(img)]}),  # missing prompt
        json.dumps({"id": "d", "prompt": "p3",
                    "images": [str(tmp_path / "nope.png")]}),
    ]
    inp = tmp_path / "in.jsonl"
    inp.write_text("\n".join(rows) + "\n")
    out = tmp_path / "out.jsonl"
    backend = FakeVLMBackend(script=["OUT1", "OUT2"])
    serve_main(["--model_path", "fake", "--input", str(inp),
                "--output", str(out)], backend=backend)

    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(lines) == 5
    by_id = {l["id"]: l for l in lines}
    assert by_id["a"]["ok"] and by_id["a"]["output"] == "OUT1"
    assert by_id["b"]["ok"] and by_id["b"]["output"] == "OUT2"
    assert not by_id["c"]["ok"] and "prompt" in by_id["c"]["error"]
    assert not by_id["d"]["ok"] and "not found" in by_id["d"]["error"]
    assert any(not l["ok"] and "invalid JSON" in l.get("error", "")
               for l in lines)
    # the loadable requests streamed as ONE continuous wave, with the
    # per-request temperature threaded through
    assert backend.stream_calls[0]["n"] == 2
    assert backend.stream_calls[0]["temperatures"] == [0.0, 0.7]


def test_serve_follow_waves(tmp_path):
    """--follow tails the input as a request queue: each appended wave
    serves on the next poll; a {"cmd": "shutdown"} line ends the
    loop after its wave is served."""
    inp = tmp_path / "in.jsonl"
    out = tmp_path / "out.jsonl"
    inp.write_text(json.dumps({"id": "w1", "prompt": "x"}) + "\n")
    backend = FakeVLMBackend(script=["A", "B"])

    def later():
        # append the second wave only after the first is served, so the
        # two waves can't collapse into one poll under CPU contention
        deadline = time.time() + 60
        while time.time() < deadline:
            if out.exists() and "w1" in out.read_text():
                break
            time.sleep(0.05)
        with inp.open("a", encoding="utf-8") as f:
            f.write(json.dumps({"id": "w2", "prompt": "y"}) + "\n")
            f.write(json.dumps({"cmd": "shutdown"}) + "\n")

    th = threading.Thread(target=later)
    th.start()
    served = run(inp, out, backend, follow=True, poll=0.05)
    th.join()
    assert served == 2
    lines = [json.loads(l) for l in out.read_text().splitlines()]
    assert [l["id"] for l in lines] == ["w1", "w2"]
    assert [l["output"] for l in lines] == ["A", "B"]
    assert len(backend.stream_calls) == 2  # two separate waves
