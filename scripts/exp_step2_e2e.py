"""End-to-end step2 throughput: manifest -> embeddings.npz, real chip.

VERDICT r1 weak #4: the headline bench excludes host I/O; this measures
the whole pipeline — native PNG decode (double-buffered against device
compute), H2D, fused bf16 BioMedCLIP embed, per-patient npz write —
with fake 512x512 PNGs on disk, random-init weights (throughput is
weight-agnostic), the --fast and (1-device) --data_parallel paths.

Reference bottleneck being beaten: the per-image PIL loop at
/root/reference/encoders/base.py:27-37.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_cohort(root: Path, patients: int, slices_each: int, size: int = 512):
    from PIL import Image
    rng = np.random.RandomState(0)
    records = []
    for p in range(patients):
        pdir = root / "imgs" / f"p{p:03d}"
        pdir.mkdir(parents=True, exist_ok=True)
        paths = []
        base = rng.randint(0, 200, (size, size), np.uint8)
        for s in range(slices_each):
            # CT-like: shared anatomy + per-slice noise (realistic PNG
            # entropy so decode cost is representative)
            img = np.clip(base + rng.randint(0, 55, (size, size)), 0,
                          255).astype(np.uint8)
            path = pdir / f"s{s:03d}.png"
            Image.fromarray(img, "L").convert("RGB").save(path)
            paths.append(str(path))
        records.append({"patient_id": f"p{p:03d}", "label": "PJP",
                        "slices": paths, "meta": {}})
    mpath = root / "manifest.jsonl"
    with mpath.open("w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return mpath


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patients", type=int, default=8)
    ap.add_argument("--slices", type=int, default=192)
    ap.add_argument("--batch_size", type=int, default=96)
    ap.add_argument("--data_parallel", action="store_true")
    ap.add_argument("--precision", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--text", action="store_true",
                    help="also embed one clinical text per patient "
                         "(PubMedBERT-256 tower; reference protocol "
                         "analysis/run_cv_experiments.py:216-237)")
    ap.add_argument("--keep", default=None,
                    help="reuse/keep the cohort under this dir")
    args = ap.parse_args()

    root = Path(args.keep) if args.keep else Path(
        tempfile.mkdtemp(prefix="step2e2e_"))
    mpath = root / "manifest.jsonl"
    if not mpath.exists():
        t0 = time.time()
        mpath = make_cohort(root, args.patients, args.slices)
        print(f"cohort: {args.patients}x{args.slices} 512^2 PNGs in "
              f"{time.time()-t0:.0f}s", flush=True)

    from emr2a_tpu.data.manifest import load_manifest
    from emr2a_tpu.encoders.biomedclip_encoder import BioMedCLIPEncoder
    from emr2a_tpu.pipelines.step2_embeddings.build_embeddings import (
        encode_images, save_embeddings)

    mesh = None
    if args.data_parallel:
        from emr2a_tpu.parallel.mesh import default_mesh
        mesh = default_mesh()
    tokenizer = _ToyBertTokenizer() if args.text else None
    enc = BioMedCLIPEncoder.random_init(
        fast="int8" if args.precision == "int8" else True, mesh=mesh,
        max_batch=args.batch_size, tokenizer=tokenizer)
    enc.assume_square_sources = True  # CT slices are square

    manifest = load_manifest(mpath)
    image_paths = {r["patient_id"]: r["slices"] for r in manifest}

    # warmup: compile the bucketed batch sizes on a copy of one patient
    first = next(iter(image_paths.values()))
    enc.encode_images(first[:args.batch_size])

    n_slices = sum(len(v) for v in image_paths.values())
    t0 = time.time()
    embs = encode_images(enc, image_paths, args.batch_size)
    t_embed = time.time() - t0
    out_dir = root / "out"
    t0 = time.time()
    save_embeddings(embs, out_dir)
    t_save = time.time() - t0

    done = sum(v.shape[0] for v in embs.values())
    result = {
        "slices": n_slices, "encoded": done,
        "embed_s": round(t_embed, 2), "save_s": round(t_save, 2),
        "end_to_end_slices_per_s": round(done / (t_embed + t_save), 1),
        "embed_slices_per_s": round(done / t_embed, 1),
    }

    if args.text:
        # one clinical text per patient, PubMedBERT tower (both
        # modalities like the reference CV protocol)
        texts = [f"patient {r['patient_id']} chest CT ground glass "
                 f"opacity bilateral infiltrate severity {p % 5}"
                 for p, r in enumerate(manifest)]
        enc.encode_batch_texts(texts)  # compile warmup (same bucket)
        t0 = time.time()
        tembs = enc.encode_batch_texts(texts)
        t_text = time.time() - t0
        ok = sum(1 for t in tembs if t is not None)
        result["texts"] = ok
        result["text_s"] = round(t_text, 3)
        result["texts_per_s"] = round(ok / t_text, 1)

    print(json.dumps(result))


class _ToyBertTokenizer:
    """Weight-free stand-in with the HF call signature the encoder
    expects: crc32 word ids padded to max_length (real tokenizers only
    change the id values, not the tower throughput)."""

    def __call__(self, texts, padding="max_length", max_length=256,
                 truncation=True, return_tensors="np"):
        import zlib
        ids = np.zeros((len(texts), max_length), np.int64)
        mask = np.zeros((len(texts), max_length), np.int64)
        for i, t in enumerate(texts):
            toks = [101] + [zlib.crc32(w.encode()) % 30000 + 103
                            for w in t.split()][:max_length - 2] + [102]
            ids[i, :len(toks)] = toks
            mask[i, :len(toks)] = 1
        return {"input_ids": ids, "attention_mask": mask}


if __name__ == "__main__":
    main()
