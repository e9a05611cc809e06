"""Flax ResNet-18 for the CNN baseline.

Capability target: the reference baseline's torchvision resnet18
backbone (baselines/cnn_baseline/train_cnn_baseline.py:132-176) with
the final fc removed and global average pooling — trained from scratch
(the environment has no torchvision weights; the reference defaults to
``pretrained=False`` too).

TPU notes: NHWC layout, 3x3 convs XLA maps to the MXU via implicit
im2col; BatchNorm carries ``batch_stats`` collection.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        residual = x
        y = conv(self.features, (3, 3), (self.strides, self.strides),
                 padding=1, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), padding=1, name="conv2")(y)
        y = norm(name="bn2")(y)

        if residual.shape != y.shape:
            residual = conv(self.features, (1, 1),
                            (self.strides, self.strides),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18(nn.Module):
    """Backbone only: (B, H, W, 3) -> (B, 512) pooled features."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = 64
        for stage, n_blocks in enumerate(self.stage_sizes):
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(features, strides, dtype=self.dtype,
                               name=f"stage{stage}_block{block}")(x, train)
            features *= 2
        return x.mean(axis=(1, 2))  # global average pool -> (B, 512)


class ImageOnlyModel(nn.Module):
    """ResNet18 over K slices, slice-mean pooled, linear head
    (train_cnn_baseline.py:132-149 semantics)."""

    num_classes: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = True):
        B, K, H, W, C = images.shape
        x = images.reshape(B * K, H, W, C)
        feats = ResNet18(dtype=self.dtype, name="backbone")(x, train)
        feats = feats.reshape(B, K, -1).mean(axis=1)
        return nn.Dense(self.num_classes, name="fc")(feats)


class MultimodalModel(nn.Module):
    """+ clinical MLP and fusion head
    (train_cnn_baseline.py:152-176 semantics)."""

    num_classes: int = 4
    clinical_dim: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, clinical, train: bool = True):
        B, K, H, W, C = images.shape
        x = images.reshape(B * K, H, W, C)
        feats = ResNet18(dtype=self.dtype, name="backbone")(x, train)
        feats = feats.reshape(B, K, -1).mean(axis=1)
        image_feat = nn.relu(nn.Dense(128, name="image_fc")(feats))
        clinical_feat = nn.relu(nn.Dense(32, name="clinical_fc")(clinical))
        combined = jnp.concatenate([image_feat, clinical_feat], axis=1)
        return nn.Dense(self.num_classes, name="fusion_fc")(combined)
