"""IRNet: inter-pixel relation network (edge + displacement heads).

Re-design of `/root/reference/IRNet/net/resnet50_irn.py` and
`IRNet/net/resnet50.py` in flax/NHWC:

- Frozen torchvision-style ResNet-50 trunk, strides (2, 2, 2, 1), BatchNorm
  permanently in inference mode (``FixedBatchNorm``, resnet50.py:10-13) and
  features stop-gradient'ed (resnet50_irn.py:117-121).
- Edge branch: five 1x1-conv + GroupNorm taps upsampled to stride 4 and fused
  to a 1-channel boundary logit (resnet50_irn.py:29-57).
- Displacement branch: 2-channel field with a ``MeanShift`` running-mean
  buffer applied at inference (resnet50_irn.py:59-114).
- :class:`AffinityDisplacementLoss` turns edge logits into pair affinities via
  the PathIndex and emits the four loss fields (resnet50_irn.py:150-222).
- :func:`edge_displacement_infer`: the inference head used for pseudo-mask
  generation — averages the edge logits of (image, h-flipped image)
  (resnet50_irn.py:225-243).
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tris_tpu.ops.resize import bilinear_resize
from tris_tpu.pseudo.indexing import PathIndex, path_max_affinity_slices


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always uses stored statistics (resnet50.py:10-13).

    Params/stats are always f32 (checkpoint layout); the affine is computed
    in f32 and the result cast back to the input's dtype, so a bf16 trunk
    (see :class:`IRNet`'s ``trunk_dtype``) keeps its activations bf16 between
    convs while the normalization math stays full-precision.
    """

    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones_init(), (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32))
        var = self.variable("batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32))
        inv = jax.lax.rsqrt(var.value + self.epsilon) * scale
        return (x.astype(jnp.float32) * inv + (bias - mean.value * inv)).astype(x.dtype)


class TorchBottleneck(nn.Module):
    """Standard torchvision bottleneck (stride on conv2) with frozen BN."""

    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out_ch = self.planes * 4
        h = nn.relu(FrozenBatchNorm(self.planes, name="bn1")(
            nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)))
        h = nn.relu(FrozenBatchNorm(self.planes, name="bn2")(
            nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2")(h)))
        h = FrozenBatchNorm(out_ch, name="bn3")(
            nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(h))
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = FrozenBatchNorm(out_ch, name="ds_bn")(
                nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="ds_conv")(x))
        return nn.relu(h + x)


class ResNet50Trunk(nn.Module):
    """torchvision ResNet-50 trunk, strides (2,2,2,1) (resnet50.py:56-109)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(64, name="bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x1 = h
        plan = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 1)]
        feats = [x1]
        for stage, (planes, blocks, stride) in enumerate(plan, start=1):
            for i in range(blocks):
                h = TorchBottleneck(planes, stride if i == 0 else 1, dtype=self.dtype,
                                    name=f"layer{stage}_{i}")(h)
            feats.append(h)
        return tuple(feats)  # x1 (post-maxpool), x2..x5


def _up(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """NHWC bilinear upsample by integer factor (align_corners=False)."""
    y = x.transpose(0, 3, 1, 2)
    y = bilinear_resize(y, (x.shape[1] * factor, x.shape[2] * factor), align_corners=False)
    return y.transpose(0, 2, 3, 1)


class IRNet(nn.Module):
    """Edge + displacement network over the frozen trunk (resnet50_irn.py:13-143).

    ``trunk_dtype`` runs the frozen R50 trunk's convs at that precision (the
    ins_seg inference path uses bfloat16 on TPU — adoption gated on final
    instance-label agreement, tools/irn_trunk_dtype_ab.py / docs/PERF_NOTES.md
    round 5); the edge/displacement heads always compute in ``dtype`` (f32 —
    their flax Convs promote the trunk features back up), and params stay f32
    in both cases.
    """

    dtype: jnp.dtype = jnp.float32
    trunk_dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.trunk = ResNet50Trunk(dtype=self.trunk_dtype or self.dtype)

        def gn_block(out_ch, groups, name):
            return (nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name=f"{name}_conv"),
                    nn.GroupNorm(num_groups=groups, dtype=self.dtype, name=f"{name}_gn"))

        self.edge_taps = [gn_block(32, 4, f"fc_edge{i}") for i in range(1, 6)]
        self.fc_edge6 = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype, name="fc_edge6")

        self.dp1 = gn_block(64, 8, "fc_dp1")
        self.dp2 = gn_block(128, 16, "fc_dp2")
        self.dp3 = gn_block(256, 16, "fc_dp3")
        self.dp4 = gn_block(256, 16, "fc_dp4")
        self.dp5 = gn_block(256, 16, "fc_dp5")
        self.dp6 = gn_block(256, 16, "fc_dp6")
        self.fc_dp7_conv1 = nn.Conv(256, (1, 1), use_bias=False, dtype=self.dtype)
        self.fc_dp7_gn = nn.GroupNorm(num_groups=16, dtype=self.dtype)
        self.fc_dp7_conv2 = nn.Conv(2, (1, 1), use_bias=False, dtype=self.dtype)
        self.mean_shift = self.variable("batch_stats", "mean_shift", lambda: jnp.zeros((2,), jnp.float32))

    def __call__(self, x: jnp.ndarray, apply_mean_shift: bool = False):
        """x: [B, H, W, 3] -> (edge logits [B, h4, w4, 1], displacement [B, h4, w4, 2])."""
        feats = tuple(jax.lax.stop_gradient(f) for f in self.trunk(x))
        x1, x2, x3, x4, x5 = feats

        def tap(block, x, up=1, crop_to=None):
            conv, gn = block
            y = gn(conv(x))
            if up > 1:
                y = nn.relu(_up(y, up))
            else:
                y = nn.relu(y)
            if crop_to is not None:
                y = y[:, : crop_to[0], : crop_to[1]]
            return y

        hw2 = (x2.shape[1], x2.shape[2])
        e1 = tap(self.edge_taps[0], x1)
        e2 = tap(self.edge_taps[1], x2)
        e3 = tap(self.edge_taps[2], x3, up=2, crop_to=hw2)
        e4 = tap(self.edge_taps[3], x4, up=4, crop_to=hw2)
        e5 = tap(self.edge_taps[4], x5, up=4, crop_to=hw2)
        edge_out = self.fc_edge6(jnp.concatenate([e1, e2, e3, e4, e5], axis=-1))

        hw3 = (x3.shape[1], x3.shape[2])
        d1 = tap(self.dp1, x1)
        d2 = tap(self.dp2, x2)
        d3 = tap(self.dp3, x3)
        d4 = tap(self.dp4, x4, up=2, crop_to=hw3)
        d5 = tap(self.dp5, x5, up=2, crop_to=hw3)
        d_up3 = tap(self.dp6, jnp.concatenate([d3, d4, d5], axis=-1), up=2, crop_to=hw2)
        d = jnp.concatenate([d1, d2, d_up3], axis=-1)
        d = nn.relu(self.fc_dp7_gn(self.fc_dp7_conv1(d)))
        dp_out = self.fc_dp7_conv2(d)
        if apply_mean_shift:
            dp_out = dp_out - self.mean_shift.value[None, None, None, :]
        return edge_out, dp_out


def to_pair_displacement(disp: jnp.ndarray, path_index: PathIndex) -> jnp.ndarray:
    """disp: [B, H, W, 2] -> pairwise displacement [B, 2, n_dirs, n_pairs]
    (resnet50_irn.py:183-199)."""
    B, H, W, _ = disp.shape
    rf = path_index.radius_floor
    ch, cw = H - rf, W - 2 * rf
    src = disp[:, :ch, rf : rf + cw]                              # [B, ch, cw, 2]
    dsts = [disp[:, dy : dy + ch, rf + dx : rf + dx + cw] for dy, dx in path_index.search_dst]
    dst = jnp.stack(dsts, axis=1)                                  # [B, n_dirs, ch, cw, 2]
    pair = src[:, None] - dst
    n_dirs = dst.shape[1]
    return pair.transpose(0, 4, 1, 2, 3).reshape(B, 2, n_dirs, ch * cw)


def affinity_displacement_losses(
    edge_out: jnp.ndarray,
    dp_out: jnp.ndarray,
    path_index: PathIndex,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-pair loss fields (resnet50_irn.py:204-222).

    Returns (pos_aff_loss [B, n_pairs_total], neg_aff_loss, dp_fg_loss
    [B, 2, n_dirs, n_pairs], dp_bg_loss).
    """
    B = edge_out.shape[0]
    edge2d = jax.nn.sigmoid(edge_out[..., 0])  # [B, h4, w4]
    # static-slice path max (bit-identical to the gather formulation; the
    # gathers and their scatter-add backward were the step's hotspot —
    # indexing.py::path_max_affinity_slices, PERF_NOTES round 5)
    groups = path_max_affinity_slices(edge2d, path_index)
    aff = jnp.concatenate([g.reshape(B, -1) for g in groups], axis=1)
    pos_aff_loss = -jnp.log(aff + 1e-5)
    neg_aff_loss = -jnp.log(1.0 + 1e-5 - aff)

    pair_disp = to_pair_displacement(dp_out, path_index)
    target = jnp.asarray(path_index.search_dst.T, jnp.float32)[None, :, :, None]  # [1,2,n_dirs,1]
    dp_fg_loss = jnp.abs(pair_disp - target)
    dp_bg_loss = jnp.abs(pair_disp)
    return pos_aff_loss, neg_aff_loss, dp_fg_loss, dp_bg_loss


def edge_displacement_infer(model: IRNet, variables, image: jnp.ndarray, stride: int = 4,
                            jit: bool = True):
    """Inference head (resnet50_irn.py:225-243): feed [image, hflip(image)],
    average edge logits (flipping the second back), sigmoid; displacement from
    the unflipped pass with mean-shift applied.

    image: [H, W, 3] -> (edge [h4, w4], disp [2, h4, w4])

    ``jit=True`` (default) runs the whole head as one program, compiled once
    per distinct image shape (flax modules hash by config, so the cache is
    shared across calls). Pass ``jit=False`` to trace nothing — e.g. when a
    dataset has so many distinct image sizes that per-shape compiles would
    dominate (the op-by-op path costs only dispatch overhead).
    """
    if jit:
        return _edge_disp_jit(model, stride)(variables, image)
    return _edge_disp_impl(model, variables, image, stride)


@_lru_cache(maxsize=8)
def _edge_disp_jit(model: IRNet, stride: int):
    return jax.jit(lambda variables, image: _edge_disp_impl(model, variables, image, stride))


def _edge_disp_impl(model: IRNet, variables, image: jnp.ndarray, stride: int):
    H, W = image.shape[0], image.shape[1]
    fh, fw = (H - 1) // stride + 1, (W - 1) // stride + 1
    batch = jnp.stack([image, image[:, ::-1]], axis=0)
    edge_out, dp_out = model.apply(variables, batch, apply_mean_shift=True)
    edge_out = edge_out[:, :fh, :fw, 0]
    dp_out = dp_out[:, :fh, :fw, :]
    edge = jax.nn.sigmoid(edge_out[0] / 2 + edge_out[1, :, ::-1] / 2)
    disp = dp_out[0].transpose(2, 0, 1)  # [2, h4, w4]
    return edge, disp
