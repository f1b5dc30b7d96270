"""CenterPoint-style multi-task detection head in Flax (NHWC), branch-fused.

ref layers/head/det3d/center_head.py:15-146 (CenterHead + SepHead): one shared
3×3 conv (512→64, BN+ReLU), then per task group a SepHead emitting
{hm, iou, reg, height, dim, rot, vel} — each branch is conv3×3(64→64)+BN+ReLU
followed by conv3×3(64→out). The hm branch's final bias initializes to
init_bias (-2.19); others use kaiming init.

TPU redesign: the reference's 6 tasks × 7 branches = 42 independent
64-channel convs are MXU-hostile (64 < the 128-lane tile, and each conv is a
separate tiny GEMM — measured 40 ms of the camera eval step on v5e). Both
branch layers are fused:
  * conv0: all 42 branches read the SAME shared feature, so their kernels
    concatenate along the output axis into ONE 3×3 conv 64→42·64 (one big
    MXU GEMM). BatchNorm is per-channel, so one BN over 42·64 channels is
    bit-equivalent to 42 separate BNs (train and eval).
  * out conv: per-branch 3×3 convs 64→out_ch become ONE dense 3×3 conv
    G·64 → G·O_max whose kernel is the block-diagonal expansion of a
    [3, 3, G, 64, O_max] parameter (off-diagonal zeros via an eye mask, so
    gradients stay block-diagonal). The dense conv spends 42× the minimal
    FLOPs but runs on the MXU at high utilization — measured 4 ms vs 24 ms
    for the FLOP-minimal batched-einsum formulation (whose O_max=3 lane dim
    is layout-hostile) and ~12 ms for 42 separate convs.
Per-branch parameter identity is preserved in the checkpoint converter
(training/torch_import.py packs reference weights into the fused layout).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


HEAD_ORDER = ("iou", "reg", "height", "dim", "rot", "vel")


def branch_list(
    tasks: Tuple[Tuple[str, ...], ...],
    common_heads: Tuple[Tuple[str, Tuple[int, int]], ...],
) -> List[Tuple[int, str, int]]:
    """Deterministic (task_id, head_name, out_channels) branch ordering used
    by the fused parameter layout and the checkpoint converter."""
    out = []
    for tid, classes in enumerate(tasks):
        for name, (ch, _num_conv) in tuple(common_heads) + (
            ("hm", (len(classes), 2)),
        ):
            out.append((tid, name, ch))
    return out


class CenterHead(nn.Module):
    tasks: Tuple[Tuple[str, ...], ...]
    common_heads: Tuple[Tuple[str, Tuple[int, int]], ...]
    share_conv_channel: int = 64
    init_bias: float = -2.19
    head_conv: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool) -> List[Dict[str, jnp.ndarray]]:
        branches = branch_list(self.tasks, self.common_heads)
        G = len(branches)
        hc = self.head_conv
        o_max = max(ch for _, _, ch in branches)

        x = x.astype(self.dtype)
        x = nn.Conv(self.share_conv_channel, (3, 3), padding=1, use_bias=True,
                    dtype=self.dtype, name="shared_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="shared_bn")(x)
        x = nn.relu(x)

        # fused branch conv0: one 3×3 conv hc -> G*hc
        h = nn.Conv(G * hc, (3, 3), padding=1, use_bias=True,
                    dtype=self.dtype, name="branches_conv0")(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="branches_bn0")(h)
        h = nn.relu(h).astype(self.dtype)

        # fused branch out conv: block-diagonal 3×3, [3, 3, G, hc, o_max]
        def out_kernel_init(key, shape, dtype=jnp.float32):
            init = nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal",
                in_axis=(0, 1, 3), out_axis=4, batch_axis=(2,),
            )
            return init(key, shape, dtype)

        def out_bias_init(key, shape, dtype=jnp.float32):
            b = np.zeros(shape, np.float32)
            for g, (_tid, name, ch) in enumerate(branches):
                if name == "hm":
                    b[g, :ch] = self.init_bias
            return jnp.asarray(b, dtype)

        wk = self.param("out_kernel", out_kernel_init, (3, 3, G, hc, o_max))
        wb = self.param("out_bias", out_bias_init, (G, o_max))

        # expand to a dense [3, 3, G·hc, G·o_max] kernel; the eye mask keeps
        # the gradient block-diagonal
        eye = jnp.asarray(np.eye(G, dtype=np.float32))
        dense = (
            wk[:, :, :, :, None, :] * eye[None, None, :, None, :, None]
        ).reshape(3, 3, G * hc, G * o_max).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            h, dense, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        B, H, W, _ = y.shape
        y = y.reshape(B, H, W, G, o_max).astype(jnp.float32)
        y = y + wb[None, None, None]

        preds: List[Dict[str, jnp.ndarray]] = [dict() for _ in self.tasks]
        for g, (tid, name, ch) in enumerate(branches):
            preds[tid][name] = y[..., g, :ch]
        return preds
