"""ResNet family — the torchvision-convnet workload of the experiment layer
(ref examples/baseline.py:60-64 ``torchvision.models.__dict__[arch]()``,
examples/nowak.py:117-122, examples/evaluation.py:98-113).

Standard torchvision topology (stem 7×7/2 + maxpool, 4 stages of
basic/bottleneck blocks, global average pool, fc). Norm and activation are
injectable so the nowak experiment can swap in ``PartialBatchNorm`` /
``partial_relu`` (ref nowak.py:50-64 ``replace_modules``) without module
surgery — pass ``norm="partial"``.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.norms import PartialBatchNorm, partial_relu

__all__ = ["ResNet", "resnet18", "resnet34", "resnet50", "resnet101"]


class ResNet(nn.Module):
    stage_sizes: Sequence[int]
    block: str = "basic"  # "basic" | "bottleneck"
    num_classes: int = 1000
    width: int = 64
    norm: str = "batch"  # "batch" | "partial"
    relu_dropout: float = 0.0  # dropout-before-ReLU (ref randomlabel.py:18-27 MyReLU)
    dtype: Any = jnp.float32

    def _norm(self, name, x, deterministic):
        if self.norm == "partial":
            return PartialBatchNorm(dtype=self.dtype, name=name)(
                x, deterministic=deterministic
            )
        return nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )(x)

    def _act(self, x, deterministic=True):
        if self.relu_dropout > 0 and not deterministic:
            x = nn.Dropout(self.relu_dropout, deterministic=False)(x)
        return partial_relu(x) if self.norm == "partial" else nn.relu(x)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, return_features: bool = False):
        conv = lambda ch, k, s, name: nn.Conv(
            ch, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
        )
        x = conv(self.width, 7, 2, "conv1")(x)
        x = self._norm("bn1", x, deterministic)
        x = self._act(x, deterministic)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        expansion = 4 if self.block == "bottleneck" else 1
        for stage, blocks in enumerate(self.stage_sizes):
            ch = self.width * 2**stage
            for b in range(blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                prefix = f"layer{stage + 1}_{b}"
                residual = x
                if self.block == "basic":
                    y = conv(ch, 3, stride, f"{prefix}_conv1")(x)
                    y = self._norm(f"{prefix}_bn1", y, deterministic)
                    y = self._act(y, deterministic)
                    y = conv(ch, 3, 1, f"{prefix}_conv2")(y)
                    y = self._norm(f"{prefix}_bn2", y, deterministic)
                    out_ch = ch
                else:
                    y = conv(ch, 1, 1, f"{prefix}_conv1")(x)
                    y = self._norm(f"{prefix}_bn1", y, deterministic)
                    y = self._act(y, deterministic)
                    y = conv(ch, 3, stride, f"{prefix}_conv2")(y)
                    y = self._norm(f"{prefix}_bn2", y, deterministic)
                    y = self._act(y, deterministic)
                    y = conv(ch * 4, 1, 1, f"{prefix}_conv3")(y)
                    y = self._norm(f"{prefix}_bn3", y, deterministic)
                    out_ch = ch * 4
                if residual.shape[-1] != out_ch or stride != 1:
                    residual = conv(out_ch, 1, stride, f"{prefix}_down")(residual)
                    residual = self._norm(f"{prefix}_down_bn", residual, deterministic)
                x = self._act(y + residual, deterministic)

        x = jnp.mean(x, axis=(1, 2))
        if return_features:
            return x
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


def _make(stages, block):
    def build(*, num_classes=1000, image_size=224, robust=False, norm="batch",
              dtype=jnp.float32, **kw):
        return ResNet(
            stage_sizes=stages, block=block, num_classes=num_classes,
            norm=norm, dtype=dtype, **kw,
        )

    return build


resnet18 = _make((2, 2, 2, 2), "basic")
resnet34 = _make((3, 4, 6, 3), "basic")
resnet50 = _make((3, 4, 6, 3), "bottleneck")
resnet101 = _make((3, 4, 23, 3), "bottleneck")
