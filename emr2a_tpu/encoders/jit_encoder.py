"""The batched jit encoding engine shared by every real encoder.

Responsibilities:
- bucket-pad batches to power-of-two sizes (bounded recompiles; padded
  rows are masked out on the host side),
- canonicalize mixed-size images on host, run decode-to-embedding as
  ONE jitted region per bucket (preprocess fused with the tower's
  patchify matmul),
- optional final L2 norm on device (CLIP/BioMedCLIP/DINO semantics),
- donate nothing, cache compiled buckets.

Text path mirrors the image path: tokenization pads to one fixed
length, and batches are chunked to ``max_batch`` with batch-size
bucketing (so compiles stay bounded even for large corpora).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import numpy as np

from emr2a_tpu.data.images import group_by_shape, resize_to
from emr2a_tpu.encoders.base import BaseEncoder
from emr2a_tpu.ops.preprocess import PreprocessSpec, preprocess_images
from emr2a_tpu.ops.similarity import l2_normalize_rows
from emr2a_tpu.parallel.sharding import batch_sharding, replicated


def _bucket(n: int, max_batch: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return min(b, max_batch)


class JitImageTextEncoder(BaseEncoder):
    """Wraps (params, image_apply, text_apply) into the encoder API.

    image_apply(params, pixels_f32) -> (B, D) raw features
    text_apply(params, input_ids, attention_mask|None) -> (B, D)
    tokenize(texts) -> (ids, mask|None) numpy, padded to a fixed length
    """

    def __init__(self,
                 params,
                 image_apply: Optional[Callable] = None,
                 text_apply: Optional[Callable] = None,
                 tokenize: Optional[Callable] = None,
                 preprocess: PreprocessSpec = PreprocessSpec(),
                 normalize: bool = True,
                 max_batch: int = 256,
                 device: str = "tpu",
                 assume_square_sources: bool = False,
                 mesh=None):
        super().__init__(device)
        # Multi-chip embedding throughput (SURVEY §2.2 dp row): with a
        # mesh, image batches shard over the ``data`` axis and params
        # replicate; XLA partitions the forward across chips.
        self.mesh = mesh
        if mesh is not None:
            params = jax.device_put(params, replicated(mesh))
        else:
            # commit params to the default device once — host-numpy
            # leaves (e.g. int8 quantized kernels) would otherwise be
            # re-staged on EVERY jit call (~seconds per batch through
            # the relay)
            params = jax.device_put(params)
        self.params = params
        self._image_apply = image_apply
        self._text_apply = text_apply
        self._tokenize = tokenize
        self.preprocess = preprocess
        self.normalize = normalize
        self.max_batch = max_batch
        # CT slices are square; setting this lets shortest-edge specs
        # use the C++ decode pool (square shortest-edge resize == exact
        # square resize).
        self.assume_square_sources = assume_square_sources
        self._jit_image = None
        self._jit_text = None
        if image_apply is not None:
            self._jit_image = jax.jit(self._shard_map(self._image_forward))
        if text_apply is not None:
            self._jit_text = jax.jit(self._shard_map(self._text_forward))

    def _pad_to_bucket(self, batch: np.ndarray) -> np.ndarray:
        """Zero-pad the leading axis up to its bucket size (one compile
        per bucket; sharded batches keep dividing the mesh data axis)."""
        b = self._bucket_for(len(batch))
        if b > len(batch):
            batch = np.concatenate(
                [batch, np.zeros((b - len(batch),) + batch.shape[1:],
                                 batch.dtype)])
        return batch

    def _shard_map(self, fn):
        """With a mesh, run the forward as explicit SPMD over the data
        axis: each chip computes its batch shard locally.  Required for
        the Pallas fast path (GSPMD cannot auto-partition pallas_call)
        and equivalent for the einsum path — forwards are per-sample."""
        if self.mesh is None:
            return fn
        from jax.sharding import PartitionSpec as P
        from emr2a_tpu.parallel.mesh import DATA_AXIS

        def wrapped(params, *args):
            present = [a for a in args if a is not None]
            in_specs = (P(),) + tuple(
                P(*((DATA_AXIS,) + (None,) * (a.ndim - 1))) for a in present)
            sm = jax.shard_map(
                lambda p, *xs: fn(p, *self._reinsert_nones(args, xs)),
                mesh=self.mesh, in_specs=in_specs,
                out_specs=P(DATA_AXIS, None), check_vma=False)
            return sm(params, *present)

        return wrapped

    @staticmethod
    def _reinsert_nones(template, values):
        it = iter(values)
        return tuple(None if t is None else next(it) for t in template)

    # -- device functions --

    def _image_forward(self, params, images_u8):
        pixels = preprocess_images(images_u8, self.preprocess)
        feats = self._image_apply(params, pixels)
        if self.normalize:
            feats = l2_normalize_rows(feats)
        return feats

    def _text_forward(self, params, input_ids, attention_mask):
        feats = self._text_apply(params, input_ids, attention_mask)
        if self.normalize:
            feats = l2_normalize_rows(feats)
        return feats

    # -- host batching --

    def _bucket_for(self, n: int) -> int:
        b = _bucket(n, self.max_batch)
        if self.mesh is not None:
            # sharded batches must divide by the data-axis size (which
            # need not be a power of two — round up to a multiple)
            from emr2a_tpu.parallel.mesh import DATA_AXIS
            n_shards = self.mesh.shape[DATA_AXIS]
            b = ((max(b, n_shards) + n_shards - 1) // n_shards) * n_shards
        return b

    def _shard(self, batch: np.ndarray):
        if self.mesh is None:
            return batch
        return jax.device_put(batch, batch_sharding(self.mesh, ndim=batch.ndim))

    def encode_batch_images(self, images: List[Optional[np.ndarray]]
                            ) -> List[Optional[np.ndarray]]:
        if self._jit_image is None:
            raise NotImplementedError(f"{type(self).__name__} is image-less")
        out: List[Optional[np.ndarray]] = [None] * len(images)
        # Canonicalize to the preprocess input size on host so every
        # image lands in one static-shape batch.  (Uniform-size CT
        # batches skip per-image work beyond the decode.)
        spec = self.preprocess
        canon: List[Optional[np.ndarray]] = []
        for img in images:
            if img is None:
                canon.append(None)
                continue
            canon.append(resize_to(img, spec.resize_size,
                                   shortest_edge=spec.shortest_edge,
                                   method=spec.method))
        groups = group_by_shape(canon)
        for _, idxs in groups.items():
            for start in range(0, len(idxs), self.max_batch):
                chunk = idxs[start:start + self.max_batch]
                batch = self._pad_to_bucket(
                    np.stack([canon[i] for i in chunk]))
                feats = np.asarray(
                    self._jit_image(self.params, self._shard(batch)))
                for j, i in enumerate(chunk):
                    out[i] = feats[j]
        return out

    def encode_images(self, image_paths) -> np.ndarray:
        """Path-based encode on the C++ decode pool when available:
        decode + resize run threaded in native code straight into one
        device batch (exact-resize specs only; shortest-edge specs fall
        back to the per-image host path to preserve aspect ratio).

        Host decode and device compute are double-buffered: chunk i+1's
        native decode is submitted before chunk i's embeddings are
        materialized, so the decode pool works through the device wait
        (the reference decodes serially per image inside the encode
        loop, encoders/base.py:27-37)."""
        from emr2a_tpu.data.native_loader import native_available

        spec = self.preprocess
        if (self._jit_image is None or not native_available()
                or (spec.shortest_edge and not self.assume_square_sources)):
            return super().encode_images(image_paths)

        from concurrent.futures import ThreadPoolExecutor

        from emr2a_tpu.data.native_loader import decode_batch

        chunks = [image_paths[s:s + self.max_batch]
                  for s in range(0, len(image_paths), self.max_batch)]
        out_embs: List[np.ndarray] = []
        with ThreadPoolExecutor(max_workers=1) as ex:
            fut = (ex.submit(decode_batch, chunks[0], spec.resize_size,
                             spec.resize_size) if chunks else None)
            for i in range(len(chunks)):
                batch, ok = fut.result()
                if i + 1 < len(chunks):
                    fut = ex.submit(decode_batch, chunks[i + 1],
                                    spec.resize_size, spec.resize_size)
                if not ok.any():
                    continue
                batch = self._pad_to_bucket(batch[ok])
                # async dispatch; np.asarray blocks on the device while
                # the decode thread fills the next chunk
                feats = np.asarray(
                    self._jit_image(self.params, self._shard(batch)))
                out_embs.append(feats[:int(ok.sum())])
        if out_embs:
            return np.concatenate(out_embs, axis=0)
        return np.array([])

    def encode_batch_texts(self, texts: List[str]) -> List[Optional[np.ndarray]]:
        if self._jit_text is None or self._tokenize is None:
            raise NotImplementedError(f"{type(self).__name__} is text-less")
        if not texts:
            return []
        ids, mask = self._tokenize(texts)
        out: List[Optional[np.ndarray]] = []
        # Chunk to max_batch like the image path: one bounded compile
        # per bucket size, and sharded batches keep dividing the mesh
        # data axis.
        for start in range(0, len(texts), self.max_batch):
            cids = ids[start:start + self.max_batch]
            cmask = mask[start:start + self.max_batch] if mask is not None else None
            n = cids.shape[0]
            b = self._bucket_for(n)
            if b > n:
                cids = np.concatenate([cids, np.tile(cids[-1:], (b - n, 1))])
                if cmask is not None:
                    cmask = np.concatenate(
                        [cmask, np.tile(cmask[-1:], (b - n, 1))])
            cids = self._shard(cids)
            if cmask is not None:
                cmask = self._shard(cmask)
            feats = np.asarray(self._jit_text(self.params, cids, cmask))
            out.extend(feats[i] for i in range(n))
        return out
