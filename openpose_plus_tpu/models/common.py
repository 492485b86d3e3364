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

from typing import Any, NamedTuple, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class QAct(NamedTuple):
    """int8-RESIDENT activation: quantized values + the (scalar) scale
    that produced them.

    Producer-side quantization (r3): each int8 conv emits its output
    already quantized at its OWN calibrated output scale, and consumers
    use the carried scale directly instead of re-quantizing at a
    consumer-side scale. The r2 consumer-side design re-quantized every
    conv input as a standalone bf16->s8 pass — a device trace of the int8
    VGG19 engine showed those passes (round-nearest-even_convert fusions)
    costing ~11 ms of the 20.7 ms step, with the shared stage-input
    concat quantized 10x per stage. QAct makes inter-conv traffic int8
    (half of bf16) and folds the requant into the conv epilogue.
    """

    q: jax.Array      # int8, activation shape
    scale: jax.Array  # (), float32: values span [-scale, scale]

    @property
    def shape(self):
        return self.q.shape


def dequant(x):
    """QAct -> bfloat16 (identity on float arrays)."""
    if isinstance(x, QAct):
        return (x.q.astype(jnp.float32)
                * (jnp.maximum(x.scale, 1e-6) / 127.0)).astype(jnp.bfloat16)
    return x


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


def _int8_conv(mod: nn.Module, x, kernel: jax.Array,
               bias: jax.Array, strides: tuple[int, int], act: bool,
               emit_q: bool = True, padding="SAME"):
    """Shared quantized-conv path for ConvRelu/SepConvRelu.

    While the `calib` collection is mutable (Engine.calibrate), runs the
    float path itself and records BOTH scales — max|input| (act_scale,
    used when this conv receives a float tensor) and max|output|
    (out_scale, the scale this conv's QAct output carries). Otherwise
    runs the int8 MXU conv with a float rescale+bias(+relu) epilogue;
    with emit_q the epilogue also requantizes at out_scale and returns a
    QAct (int8-resident chain), else returns the bf16 activation.

    A QAct input is consumed DIRECTLY (its carried scale replaces
    act_scale; no quantize pass) — the whole point of producer-side
    quantization.
    """
    in_sv = mod.variable("calib", "act_scale",
                         lambda: jnp.zeros((), jnp.float32))
    out_sv = mod.variable("calib", "out_scale",
                          lambda: jnp.zeros((), jnp.float32))
    if mod.is_mutable_collection("calib"):
        xf = dequant(x)
        in_sv.value = jnp.maximum(in_sv.value, jnp.max(jnp.abs(xf)).astype(
            jnp.float32))
        y = jax.lax.conv_general_dilated(
            xf.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16), strides,
            padding, dimension_numbers=_DN) + bias.astype(jnp.bfloat16)
        y = nn.relu(y) if act else y
        out_sv.value = jnp.maximum(out_sv.value, jnp.max(jnp.abs(y)).astype(
            jnp.float32))
        return y
    if isinstance(x, QAct):
        q, s_in = x.q, jnp.maximum(x.scale, 1e-6)
    else:
        s_in = jnp.maximum(in_sv.value, 1e-6)
        q = quantize_act(x, s_in)
    qw, wmax = quantize_weight(kernel)
    acc = jax.lax.conv_general_dilated(
        q, qw, strides, padding,
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    rescale = s_in / (127.0 * 127.0) * wmax
    y = acc.astype(jnp.float32) * rescale + bias
    y = nn.relu(y) if act else y
    if emit_q:
        s_out = jnp.maximum(out_sv.value, 1e-6)
        return QAct(quantize_act(y, s_out), s_out)
    return y.astype(jnp.bfloat16)


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
        cin = x.q.shape[-1] if isinstance(x, QAct) else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (k, k, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        dt = _dtype(self.compute_dtype)
        strides = (self.stride, self.stride)
        if self.compute_dtype == "int8":
            # int8-resident: consumes QAct or float, emits QAct (float
            # during the calibration pass)
            return _int8_conv(self, x, kernel, bias, strides, self.act)
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


def s2d2_flip_w(x: jax.Array, c: int) -> jax.Array:
    """Horizontal flip of an s2d^2-layout image (W % 4 == 0): reverse the
    outer block axis, swap the vx groups, swap the wx groups."""
    b, h, w, c16 = x.shape
    x = x[:, :, ::-1].reshape(b, h, w, 2, 2, 2, 2, c)
    return x[:, :, :, :, ::-1, :, ::-1].reshape(b, h, w, c16)


# ---------------------------------------------------------------------
# Deep space-to-depth lowerings (MobileNet-thin early stage).
#
# The stride-2/4 region (conv1, dw1, dw2) is the roofline-starved part of
# the net: 3-48 channels waste MXU lanes and tile padding inflates HBM
# traffic (profiled 18-23% of peak; scripts/profile_stem_chain.py). The
# fix is structural: stay on the (H/4, W/4) block grid with 4x/16x the
# channels, where every conv below is a dense MXU-shaped contraction of
# the SAME original parameters, rearranged at trace time:
#
#   conv1 k3 s2 (3->C)       => dense 2x2, 16*3 -> 4C   [s2d^2 in, s2d out]
#   dw 3x3 s1 depthwise (C)  => dense 3x3, 4C -> 4C     [block-sparse]
#   pw 1x1 (C->F)            => dense 1x1, 4C -> 4F     [block-diagonal]
#   dw 3x3 s2 depthwise (C)  => dense 2x2, 4C -> C      [s2d in, PLAIN out]
#
# Zero-filled slots waste MXU FLOPs — free in a bandwidth-bound stage
# (measured 3.6x: 1.98 ms -> 0.54 ms for the whole chain at bs=8 368x656).
# s2d-layout channel order everywhere: m-major, block position minor
# (m*4 + wy*2 + wx); the s2d^2 INPUT uses nested position-major order
# (space_to_depth applied twice).

def _stem_s2d2_kernel(kernel: jax.Array, cin: int, cout: int) -> jax.Array:
    """(3,3,cin,cout) k3-s2 kernel -> (2,2,16*cin,4*cout) on the s2d^2
    grid. In channel ((vy*2+vx)*4 + wy*2+wx)*cin + c; out o*4 + uy*2+ux:
    output row 2I+uy reads original rows 4I+2uy..+2 = block rows I, I+1."""
    ind = np.zeros((2, 2, 16, 4, 3, 3), np.float32)
    for P in range(2):
        for Q in range(2):
            for uy, ux, vy, vx, wy, wx in np.ndindex(2, 2, 2, 2, 2, 2):
                ky = 4 * P + 2 * vy + wy - 2 * uy
                kx = 4 * Q + 2 * vx + wx - 2 * ux
                if 0 <= ky < 3 and 0 <= kx < 3:
                    ind[P, Q, (vy * 2 + vx) * 4 + wy * 2 + wx,
                        uy * 2 + ux, ky, kx] = 1.0
    k = jnp.einsum("PQjukl,klcO->PQjcOu", jnp.asarray(ind), kernel)
    return k.reshape(2, 2, 16 * cin, cout * 4)


def _s1_block_indicator() -> np.ndarray:
    """(3,3, in-pos, out-pos, ky, kx) 0/1 geometry of a 3x3 STRIDE-1 conv
    on the 2x2 block grid (shared by every s1 deep-s2d lowering): output
    row 2I+uy reads rows 2I+uy-1..+1 = block rows I-1..I+1, pad 1, with
    tap ky = 2P + vy - uy - 1."""
    ind = np.zeros((3, 3, 4, 4, 3, 3), np.float32)
    for P in range(3):
        for Q in range(3):
            for uy, ux, vy, vx in np.ndindex(2, 2, 2, 2):
                ky = 2 * P + vy - uy - 1
                kx = 2 * Q + vx - ux - 1
                if 0 <= ky < 3 and 0 <= kx < 3:
                    ind[P, Q, vy * 2 + vx, uy * 2 + ux, ky, kx] = 1.0
    return ind


def _dw_s2d_kernel(dwk: jax.Array, c: int) -> jax.Array:
    """Depthwise (3,3,1,c) s1 -> dense (3,3,4c,4c) on the s2d grid
    (channel m*4+pos): see _s1_block_indicator for the geometry."""
    ind = _s1_block_indicator()
    t = jnp.einsum("PQiokl,klm->PQmio", jnp.asarray(ind), dwk[:, :, 0, :])
    e = t[:, :, :, :, None, :] * jnp.eye(c, dtype=dwk.dtype)[
        None, None, :, None, :, None]
    return e.reshape(3, 3, 4 * c, 4 * c)


def _dw_s2d_stride2_kernel(dwk: jax.Array, c: int) -> jax.Array:
    """Depthwise (3,3,1,c) s2 -> dense (2,2,4c,c): consumes the s2d grid,
    emits the PLAIN stride-2 grid (out pixel P reads rows 2P..2P+2 =
    block rows P, P+1; pad (0,1))."""
    ind = np.zeros((2, 2, 4, 3, 3), np.float32)
    for p in range(2):
        for q in range(2):
            for vy, vx in np.ndindex(2, 2):
                ky, kx = 2 * p + vy, 2 * q + vx
                if ky < 3 and kx < 3:
                    ind[p, q, vy * 2 + vx, ky, kx] = 1.0
    t = jnp.einsum("pqikl,kln->pqni", jnp.asarray(ind), dwk[:, :, 0, :])
    e = t[:, :, :, :, None] * jnp.eye(c, dtype=dwk.dtype)[
        None, None, :, None, :]
    return e.reshape(2, 2, 4 * c, c)


def _pw_s2d_kernel(pwk: jax.Array, c: int, f: int) -> jax.Array:
    """Pointwise (1,1,c,f) -> block-diagonal (1,1,4c,4f) on the s2d grid
    (each block position uses the same weights)."""
    e = pwk[0, 0, :, None, :, None] * jnp.eye(4, dtype=pwk.dtype)[
        None, :, None, :]
    return e.reshape(1, 1, 4 * c, 4 * f)


def _s1_s2d_kernel(kernel: jax.Array) -> jax.Array:
    """(3,3,cin,cout) k3-STRIDE-1 DENSE kernel -> (3,3,4cin,4cout) on the
    block grid, position-MAJOR channels on both sides (ch = pos*C + c);
    geometry shared with the depthwise lowering (_s1_block_indicator)."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    ind = _s1_block_indicator()
    k = jnp.einsum("PQiukl,klcd->PQicud", jnp.asarray(ind), kernel)
    return k.reshape(3, 3, 4 * cin, 4 * cout)


def s2d_maxpool_to_plain(x: jax.Array, c: int) -> jax.Array:
    """2x2 stride-2 maxpool of the underlying image, computed on a
    pos-major s2d-layout tensor as the max over its 4 contiguous position
    chunks — EXACT (each block holds one pool window) and free (no
    depth-to-space, and the chunk maxes fuse into the producer)."""
    p = x[..., :c]
    for i in range(1, 4):
        p = jnp.maximum(p, x[..., i * c:(i + 1) * c])
    return p


class S2DConvRelu(nn.Module):
    """3x3 STRIDE-1 conv + ReLU on the space-to-depth block grid.

    Parameter-compatible with ConvRelu (same "kernel"/"bias" names and
    shapes). Input and output are pos-major s2d layouts (4*cin / 4*cout
    channels); the raw s2d image (B,H/2,W/2,12) is already pos-major, so
    the first stem conv consumes it directly. The dense rearranged kernel
    does 4x structurally-zero FLOPs — a clear win where the plain conv is
    lane-starved (3..32-channel VGG stems run at ~10-15% MXU; measured
    2.5x on the whole conv1 block at C=32 — scripts/profile_vgg_stem.py),
    roughly neutral by C=64. Followed by s2d_maxpool_to_plain, the usual
    VGG conv1 block [conv, conv, pool2] never materializes the full-res
    grid at all.
    """

    features: int
    in_channels: int
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x):
        cin = self.in_channels
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        if x.shape[-1] != 4 * cin:
            raise ValueError(
                f"S2DConvRelu expects {4 * cin} channels, got {x.shape}")
        if self.compute_dtype == "int8":
            # int8 on the block grid (r3): quantize the REARRANGED kernel
            # (per-output-channel over the 4*cout block channels) and run
            # the same MXU int8 conv + epilogue as ConvRelu. This is what
            # un-gates the s2d stem for int8 VGG models — the plain int8
            # conv1 region cost 4.5 ms of the 20.3 ms VGG19 step (3-64ch
            # full-res convs + the (4,128)-tile 3-channel input copy).
            return _int8_conv(self, x, _s1_s2d_kernel(kernel),
                              jnp.tile(bias, 4), (1, 1), act=True,
                              padding=[(1, 1), (1, 1)])
        dt = _dtype(self.compute_dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), _s1_s2d_kernel(kernel).astype(dt), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=_DN)
        return nn.relu(y + jnp.tile(bias, 4).astype(dt))


class StemConvRelu(nn.Module):
    """3x3 stride-2 stem conv + ReLU, lowered via space-to-depth.

    Parameter-compatible with ConvRelu (same "kernel" (3,3,cin,cout) and
    "bias" names/shapes — one checkpoint serves every lowering). Three
    input forms, selected by shape:

      (B,H,W,cin)        plain — s2d applied on device, then the k2 path
      (B,H/2,W/2,4cin)   s2d — 2x2 kernel over 4cin channels, PLAIN out
      (B,H/4,W/4,16cin)  s2d^2 — 2x2 kernel over 16cin channels, and the
                         OUTPUT stays on the block grid ((B,H/4,W/4,4cout),
                         channel o*4+pos) feeding s2d-space SepConvRelu
                         blocks — the fast path (scripts/profile_stem_*).

    Numerics: the same 9 tap products per output, contracted on the MXU
    instead of im2col — bf16-accumulation-order differences only (~1e-3;
    exact in f32). SAME padding parity: k3 s2 on even dims pads (0,1); on
    the block grid that is exactly k2 s1 with padding ((0,1),(0,1)).
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
        if x.shape[-1] == 16 * cin:  # s2d^2: emit s2d-layout output
            wq = _stem_s2d2_kernel(kernel, cin, self.features)
            b = jnp.repeat(bias, 4)
        else:
            if x.shape[-1] == cin:
                x = space_to_depth(x)
            elif x.shape[-1] != 4 * cin:
                raise ValueError(f"stem expects {cin}, {4 * cin} or "
                                 f"{16 * cin} channels, got {x.shape}")
            wq = jnp.zeros((2, 2, 4 * cin, self.features), kernel.dtype)
            for ky in range(3):
                for kx in range(3):
                    p, wy = divmod(ky, 2)
                    q, wx = divmod(kx, 2)
                    g = (wy * 2 + wx) * cin
                    wq = wq.at[p, q, g:g + cin].set(kernel[ky, kx])
            b = bias
        y = jax.lax.conv_general_dilated(
            x.astype(dt), wq.astype(dt), (1, 1), [(0, 1), (0, 1)],
            dimension_numbers=_DN) + b.astype(dt)
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
    # Input (and for stride 1, output) live on the space-to-depth block
    # grid with 4x channels (m*4+pos order); the SAME depthwise/pointwise
    # params are rearranged into dense MXU-shaped kernels at trace time
    # (see the deep-s2d lowering notes above). stride 2 emits the plain
    # grid. Requires kernel==3 and a float compute path.
    s2d_space: bool = False

    @nn.compact
    def __call__(self, x):
        # The separable path is bf16-resident even in int8 mode (the
        # depthwise conv is VPU-bound); a QAct from an upstream ConvRelu
        # is dequantized at the handoff.
        x = dequant(x)
        c_in = x.shape[-1] // 4 if self.s2d_space else x.shape[-1]
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

        if self.s2d_space:
            assert k == 3 and self.stride in (1, 2) \
                and self.compute_dtype != "int8"
            if self.stride == 1:
                y = jax.lax.conv_general_dilated(
                    x.astype(dt), _dw_s2d_kernel(dwk, c_in).astype(dt),
                    (1, 1), [(1, 1), (1, 1)], dimension_numbers=_DN)
                y = nn.relu(y + jnp.repeat(dwb, 4).astype(dt))
                y = jax.lax.conv_general_dilated(
                    y, _pw_s2d_kernel(pwk, c_in, self.features).astype(dt),
                    (1, 1), "SAME", dimension_numbers=_DN)
                return nn.relu(y + jnp.repeat(pwb, 4).astype(dt))
            y = jax.lax.conv_general_dilated(
                x.astype(dt), _dw_s2d_stride2_kernel(dwk, c_in).astype(dt),
                (1, 1), [(0, 1), (0, 1)], dimension_numbers=_DN)
            y = nn.relu(y + dwb.astype(dt))  # plain grid from here on
            y = jax.lax.conv_general_dilated(
                y, pwk.astype(dt), (1, 1), "SAME", dimension_numbers=_DN)
            return nn.relu(y + pwb.astype(dt))

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
            # emit_q=False keeps this path bf16-resident end to end.
            return _int8_conv(self, y, pwk, pwb, (1, 1), act=True,
                              emit_q=False)
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
        # (dequant: the int8-resident chain ends here.)
        x = nn.Conv(self.out_features, (1, 1), dtype=jnp.float32,
                    param_dtype=jnp.float32)(dequant(x))
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
        # int8-resident stage inputs: quantize the (F, conf, paf) concat
        # ONCE per stage at a per-stage calibrated scale and hand the
        # QAct to both branches — the r2 design quantized the same
        # concat at every consumer conv (10x per stage on VGG19, ~11 ms
        # of standalone quantize fusions in the device trace).
        f_float = dequant(feature) if self.n_stages > 1 else None
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
                    [f_float, confs[-1].astype(f_float.dtype),
                     pafs[-1].astype(f_float.dtype)], axis=-1)
                # dense heads only: the separable branches are
                # bf16-resident (depthwise first), so a QAct stage input
                # would just be an extra quant/dequant roundtrip there
                if self.compute_dtype == "int8" and not self.separable:
                    sv = self.variable("calib", f"stage{stage + 1}_in_scale",
                                       lambda: jnp.zeros((), jnp.float32))
                    if self.is_mutable_collection("calib"):
                        sv.value = jnp.maximum(
                            sv.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
                    else:
                        s = jnp.maximum(sv.value, 1e-6)
                        x = QAct(quantize_act(x, s), s)
                # Materialize the stage input ONCE — but only where it
                # wins. Without the barrier XLA fuses this 4-piece concat
                # into every consumer — both branches' first depthwise
                # conv and, in training, their dx/dW transposes —
                # re-gathering the pieces each time: measured 185 us vs
                # 129 us for the same dw conv reading a contiguous 537-ch
                # buffer (bs=8 46x82 device trace,
                # scripts/trace_train_step.py). Wins for the separable
                # (thin) heads at serving/training batches: headline
                # 1920 -> 2093-2163 FPS, train 546 -> 590 imgs/s.
                # Measured LOSSES elsewhere, hence the gate: dense-head
                # VGG19 at bs=1 297 -> 275 FPS (tiny stage inputs, the
                # extra materialization dominates) and mobilenet bs=32
                # 1765 -> 1519-1633 (the materialized 537-ch buffers
                # fall out of the alternate-memory working set).
                if self.separable and x.shape[0] <= 16:
                    x = jax.lax.optimization_barrier(x)
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
              pool: bool = True, s2d_stem: bool = False):
    """n stacked 3x3 conv+relu, optional 2x2 max pool.

    s2d_stem runs the whole block on the space-to-depth grid (same
    params, rearranged at trace time — see S2DConvRelu) and pools via the
    free channel-chunk max; accepts a plain even-dim input (s2d applied
    on device) or a pre-transformed (B, H/2, W/2, 12) one. Used for the
    lane-starved conv1 blocks of the VGG-family models.
    """
    # s2d_stem is an OPT-IN (pass cfg.stem_s2d): the block itself decides
    # eligibility from the input — even dims or a pre-permuted 12-channel
    # input — so the gate lives here once, not in every model. int8 runs
    # the block-grid lowering too (S2DConvRelu's quantized path, r3).
    if s2d_stem:
        even = x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        s2d_stem = even or x.shape[-1] == 12
    if x.shape[-1] == 12 and not s2d_stem:
        raise ValueError("s2d input layout needs stem_s2d")
    if s2d_stem:
        assert pool, "s2d_stem emits the pooled plain grid"
        if x.shape[-1] == 3:
            x = space_to_depth(x)
        elif x.shape[-1] != 12:
            raise ValueError(f"s2d_stem expects an RGB image (plain or "
                             f"s2d layout), got {x.shape}")
        # Measured three conv1 lowerings inside the int8 VGG19 engine
        # (bs=8 368x656): plain-int8 4.4 ms, s2d-int8 4.4 ms, s2d-bf16
        # 4.9 ms — the s2d grid's 4x structural zero-FLOPs saturate the
        # MXU for exactly the bandwidth it saves, so the region is at its
        # floor under every lowering. Kept uniform int8-s2d (marginally
        # best, no (4,128)-tile 3-channel input copy, one quantized path).
        cin = 3
        for i, f in enumerate(features):
            x = S2DConvRelu(f, in_channels=cin, compute_dtype=compute_dtype,
                            name=f"{prefix}_{i + 1}")(x)
            cin = f
        if isinstance(x, QAct):  # max commutes with the positive scale
            return QAct(s2d_maxpool_to_plain(x.q, features[-1]), x.scale)
        return s2d_maxpool_to_plain(x, features[-1])
    for i, f in enumerate(features):
        x = ConvRelu(f, compute_dtype=compute_dtype,
                     name=f"{prefix}_{i + 1}")(x)
    if pool:
        if isinstance(x, QAct):
            # max commutes with the (positive) dequant scale: pool the
            # int8 plane directly, half the pooling traffic of bf16
            x = QAct(nn.max_pool(x.q, (2, 2), strides=(2, 2)), x.scale)
        else:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
    return x
