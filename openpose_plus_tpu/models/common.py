"""Shared building blocks for the pose model zoo.

Every model follows the reference's two-branch multi-stage layout
(openpose_plus/models/*.py [HIGH behavior; empty mount — SURVEY.md]): a
backbone produces a stride-8 feature map F; stage 1 predicts (conf, paf)
from F; each later stage refines from concat(F, conf_{t-1}, paf_{t-1}).
All per-stage outputs are returned for deep supervision.

TPU-first choices: NHWC layout end-to-end, bfloat16 compute with float32
params (MXU-native), channel counts kept at multiples of 8 where the
reference allows, and plain XLA convolutions (profiling decides where
Pallas kernels replace them — see ops/pallas/).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


# Model output convention: a plain dict {'conf': [per-stage
# (N,H/8,W/8,19)], 'paf': [per-stage (N,H/8,W/8,38)], 'feature':
# (N,H/8,W/8,C)} — a plain dict so it is a JAX pytree.
def _dtype(name: str):
    # "int8" is a quantized-inference MODE, not an activation dtype: dense
    # convs run int8 x int8 -> int32 on the MXU with a float rescale
    # epilogue, while everything between convs is carried in bfloat16.
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "int8": jnp.bfloat16}[name]


_DN = ("NHWC", "HWIO", "NHWC")


def quantize_weight(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8 weight quantization.

    kernel: (kh, kw, cin, cout) float32 -> (int8 kernel, (cout,) scales).
    Runs at inference time on the tiny weight tensors (fused/negligible);
    the float params stay the single source of truth, so one checkpoint
    serves every compute mode (TensorRT-int8's calibration-cache analogue
    keeps only ACTIVATION scales as state — see ConvRelu).
    """
    wmax = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12)
    qw = jnp.round(kernel / wmax * 127.0).astype(jnp.int8)
    return qw, wmax


def quantize_act(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Symmetric per-tensor int8 activation quantization (calibrated)."""
    s = jnp.maximum(scale, 1e-6).astype(jnp.float32)
    q = jnp.round(jnp.clip(x.astype(jnp.float32) / s, -1.0, 1.0) * 127.0)
    return q.astype(jnp.int8)


def _int8_conv(mod: nn.Module, x: jax.Array, kernel: jax.Array,
               bias: jax.Array, strides: tuple[int, int], act: bool
               ) -> jax.Array | None:
    """Shared quantized-conv path for ConvRelu/SepConvRelu.

    While the `calib` collection is mutable (Engine.calibrate), records
    max|x| into this layer's act_scale and returns None so the caller
    runs its float path; otherwise runs the int8 MXU conv with a float
    rescale epilogue and returns the bf16 activation.
    """
    sv = mod.variable("calib", "act_scale",
                      lambda: jnp.zeros((), jnp.float32))
    if mod.is_mutable_collection("calib"):
        sv.value = jnp.maximum(sv.value, jnp.max(jnp.abs(x)).astype(
            jnp.float32))
        return None
    qw, wmax = quantize_weight(kernel)
    acc = jax.lax.conv_general_dilated(
        quantize_act(x, sv.value), qw, strides, "SAME",
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    rescale = jnp.maximum(sv.value, 1e-6) / (127.0 * 127.0) * wmax
    y = (acc.astype(jnp.float32) * rescale + bias).astype(jnp.bfloat16)
    return nn.relu(y) if act else y


class ConvRelu(nn.Module):
    """kxk conv + ReLU (the reference's tl.layers.Conv2d+relu).

    compute_dtype="int8" runs the conv on the MXU in int8 (inference
    only, ~2x bf16 at these shapes — the reference's TensorRT int8 mode):
    per-channel weight scales derive from the float params on the fly;
    the per-tensor activation scale is a `calib` collection variable
    recorded by a calibration pass (Engine.calibrate — the TensorRT
    calibration-cache analogue). While the calib collection is mutable
    the layer computes in bf16 and records max|x| instead.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    act: bool = True
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        dt = _dtype(self.compute_dtype)
        strides = (self.stride, self.stride)
        if self.compute_dtype == "int8":
            y = _int8_conv(self, x, kernel, bias, strides, self.act)
            if y is not None:
                return y
        y = jax.lax.conv_general_dilated(
            x.astype(dt), kernel.astype(dt), strides, "SAME",
            dimension_numbers=_DN) + bias.astype(dt)
        return nn.relu(y) if self.act else y


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel = (wy*2+wx)*C + c.

    Pure data movement (reshape+transpose) — the MLPerf ResNet stem trick:
    a 3x3 stride-2 conv on C channels re-expressed on the s2d grid uses a
    2x2 stride-1 kernel over 4C channels, turning a 3/128-lane conv into an
    MXU-shaped one (profiled 1.15 ms -> 0.36 ms at the MobileNet-thin stem
    when the input arrives pre-transformed; scripts/profile_conv1*.py).
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array, c: int) -> jax.Array:
    """Inverse of space_to_depth: (B, H, W, 4C) -> (B, 2H, 2W, C)."""
    b, h, w, _ = x.shape
    x = x.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c)


def s2d_flip_w(x: jax.Array, c: int) -> jax.Array:
    """Horizontal flip of an s2d-layout image, without leaving the layout.

    For even W, flipping columns is: reverse the block axis, then swap the
    wx=0/wx=1 channel groups (exact; see engine flip-TTA)."""
    b, h, w, c4 = x.shape
    x = x[:, :, ::-1].reshape(b, h, w, 2, 2, c)
    return x[:, :, :, :, ::-1].reshape(b, h, w, c4)


class StemConvRelu(nn.Module):
    """3x3 stride-2 stem conv + ReLU, lowered via space-to-depth.

    Parameter-compatible with ConvRelu (same "kernel" (3,3,cin,cout) and
    "bias" names/shapes — one checkpoint serves both lowerings); the 2x2
    s2d-grid kernel is rearranged from those params at trace time. Accepts
    either a plain (B,H,W,cin) input (s2d applied on device) or a
    pre-transformed (B,H/2,W/2,4*cin) input — the fast path: the host
    loader emits s2d bytes during letterbox, and conv1 stops being the
    most roofline-starved layer in the net (3.6% of HBM peak -> ~12%).

    Numerics: the same 9 tap products per output, contracted 2x2x4cin on
    the MXU instead of im2col 3x3xcin — bf16-accumulation-order level
    differences only (~1e-3; scripts/profile_conv1_u8.py asserts it).
    SAME padding parity: k3 s2 on even dims pads (0,1); on the s2d grid
    that is exactly k2 s1 with padding ((0,1),(0,1)).
    """

    features: int
    in_channels: int = 3
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x):
        cin = self.in_channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        dt = _dtype(self.compute_dtype)
        wq = jnp.zeros((2, 2, 4 * cin, self.features), kernel.dtype)
        for ky in range(3):
            for kx in range(3):
                p, wy = divmod(ky, 2)
                q, wx = divmod(kx, 2)
                g = (wy * 2 + wx) * cin
                wq = wq.at[p, q, g:g + cin].set(kernel[ky, kx])
        if x.shape[-1] == cin:
            x = space_to_depth(x)
        elif x.shape[-1] != 4 * cin:
            raise ValueError(
                f"stem expects {cin} or {4 * cin} channels, got {x.shape}")
        y = jax.lax.conv_general_dilated(
            x.astype(dt), wq.astype(dt), (1, 1), [(0, 1), (0, 1)],
            dimension_numbers=_DN) + bias.astype(dt)
        return nn.relu(y)


class SepConvRelu(nn.Module):
    """Depthwise-separable conv (MobileNet-style): DW kxk + PW 1x1, ReLU.

    The depthwise stage is the TPU hot spot the reference never had
    (TensorRT fused it). With `fused=True` and an eligible shape (stride 1,
    3x3, bf16, fits VMEM) the whole block runs as ONE Pallas kernel that
    keeps the DW intermediate in VMEM (ops/pallas/sepconv.py) — the forward
    pass is HBM-bound, so halving a layer's traffic nearly halves its cost.
    Both paths share the same parameters; the XLA path (training/CPU)
    reproduces flax nn.Conv numerics exactly.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    compute_dtype: str = "bfloat16"
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        k = self.kernel
        dt = _dtype(self.compute_dtype)
        dwk = self.param("dw_kernel", nn.initializers.lecun_normal(),
                         (k, k, 1, c_in), jnp.float32)
        dwb = self.param("dw_bias", nn.initializers.zeros_init(),
                         (c_in,), jnp.float32)
        pwk = self.param("pw_kernel", nn.initializers.lecun_normal(),
                         (1, 1, c_in, self.features), jnp.float32)
        pwb = self.param("pw_bias", nn.initializers.zeros_init(),
                         (self.features,), jnp.float32)

        if (self.fused and self.stride == 1 and k == 3
                and self.compute_dtype == "bfloat16"):
            from openpose_plus_tpu.ops.pallas import sepconv

            if sepconv.fused_sepconv_fits(x.shape[1], x.shape[2], c_in,
                                          self.features):
                return sepconv.fused_sepconv(x, dwk, dwb, pwk, pwb)

        y = jax.lax.conv_general_dilated(
            x.astype(dt), dwk.astype(dt), (self.stride, self.stride),
            "SAME", dimension_numbers=_DN, feature_group_count=c_in)
        y = nn.relu(y + dwb.astype(dt))
        if self.compute_dtype == "int8":
            # Depthwise stays bf16 (VPU-bound; int8 measured SLOWER there);
            # the pointwise 1x1 — where the MACs are — runs on the MXU in
            # int8 with calibrated activation scale, as in ConvRelu.
            out = _int8_conv(self, y, pwk, pwb, (1, 1), act=True)
            if out is not None:
                return out
        y = jax.lax.conv_general_dilated(
            y, pwk.astype(dt), (1, 1), "SAME", dimension_numbers=_DN)
        return nn.relu(y + pwb.astype(dt))


class StageBranch(nn.Module):
    """One branch (conf or paf) of one refinement stage.

    Stage 1 (reference models_vgg.py stage1): 3x [3x3, mid] + [1x1, proj]
    + [1x1, out]. Stages 2+: 5x [kxk, mid] + [1x1, mid] + [1x1, out] with
    k=7 in the VGG models.
    """

    out_features: int
    mid_features: int = 128
    n_convs: int = 3
    kernel: int = 3
    proj_features: int = 512
    separable: bool = False
    compute_dtype: str = "bfloat16"
    fused: bool = False

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_convs):
            if self.separable:
                x = SepConvRelu(self.mid_features, kernel=self.kernel,
                                compute_dtype=self.compute_dtype,
                                fused=self.fused)(x)
            else:
                x = ConvRelu(self.mid_features, kernel=self.kernel,
                             compute_dtype=self.compute_dtype)(x)
        x = ConvRelu(self.proj_features, kernel=1,
                     compute_dtype=self.compute_dtype)(x)
        # Final prediction in float32: the decoder compares map values.
        x = nn.Conv(self.out_features, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32)(x)
        return x


class MultiStageHead(nn.Module):
    """The full stage stack shared by every backbone.

    Returns per-stage (conf, paf) lists; later stages see
    concat(F, conf_{t-1}, paf_{t-1}) exactly as in the reference.
    """

    n_heatmaps: int = 19
    n_pafs: int = 38
    n_stages: int = 6
    stage1_convs: int = 3
    stage1_kernel: int = 3
    stage1_proj: int = 512
    refine_convs: int = 5
    refine_kernel: int = 7
    refine_mid: int = 128
    separable: bool = False
    compute_dtype: str = "bfloat16"
    remat: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, feature):
        confs, pafs = [], []
        branch_cls = nn.remat(StageBranch) if self.remat else StageBranch
        x = feature
        for stage in range(self.n_stages):
            if stage == 0:
                kw: dict[str, Any] = dict(
                    n_convs=self.stage1_convs, kernel=self.stage1_kernel,
                    proj_features=self.stage1_proj)
            else:
                kw = dict(n_convs=self.refine_convs, kernel=self.refine_kernel,
                          mid_features=self.refine_mid, proj_features=self.refine_mid)
                x = jnp.concatenate(
                    [feature, confs[-1].astype(feature.dtype),
                     pafs[-1].astype(feature.dtype)], axis=-1)
            conf = branch_cls(self.n_heatmaps, separable=self.separable,
                              compute_dtype=self.compute_dtype,
                              fused=self.fused,
                              name=f"stage{stage + 1}_conf", **kw)(x)
            paf = branch_cls(self.n_pafs, separable=self.separable,
                             compute_dtype=self.compute_dtype,
                             fused=self.fused,
                             name=f"stage{stage + 1}_paf", **kw)(x)
            confs.append(conf)
            pafs.append(paf)
        return confs, pafs


def vgg_block(x, features: Sequence[int], compute_dtype: str, prefix: str,
              pool: bool = True):
    """n stacked 3x3 conv+relu, optional 2x2 max pool."""
    for i, f in enumerate(features):
        x = ConvRelu(f, compute_dtype=compute_dtype,
                     name=f"{prefix}_{i + 1}")(x)
    if pool:
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
    return x
