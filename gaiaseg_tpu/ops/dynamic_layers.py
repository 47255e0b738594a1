"""Masked dynamic layers: DynConv2d / DynLinear / DynBatchNorm / DynLayerNorm.

TPU-native re-design of the gaiavision dynamic-op substrate the reference
builds on (SURVEY.md §2.9): gaiavision stores weights at MAX shape and
*slices* them per subnet (``weight[:out_active, :in_active]``), which is a
recompile per shape under XLA. Here weights stay at MAX shape and the active
width arrives as a **traced** int -> channel mask; inactive lanes are zeroed.
For any op whose inactive input lanes are zero, masking is numerically
identical to slicing (property-tested in tests/test_dynamic_ops.py).

Layout is NHWC (TPU-native); compute dtype defaults to bfloat16 with float32
accumulation on the MXU; norm statistics are float32.

DynSyncBN note: under ``jit`` with the batch sharded over the ``data`` mesh
axis, ``jnp.mean`` over the batch axis is a *global* mean — XLA inserts the
ICI all-reduce. Cross-replica BN sync (reference mmcv SyncBN / gaiavision
DynSyncBN, NCCL allreduce) therefore needs no explicit collective here.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .masking import active_count

Array = jnp.ndarray
Dtype = Any


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal")


def space_to_depth_conv(x: Array, kernel: Array,
                        strides: Tuple[int, int],
                        padding: Tuple[int, int]) -> Array:
    """Strided low-channel conv via W-phase space-to-depth. Exact identity.

    For stride ``s``, ``y[j] = sum_v x[s*j + v - p] w[v]`` regroups by input
    phase ``q = (v-p) mod s``: packing the W phases into channels turns the
    W stride into a stride-1 conv over ``s*Ci`` channels. In NHWC the W and
    C dims are adjacent minor dims, so that packing is a FREE reshape —
    unlike full 2D space-to-depth, whose H-phase interleave transpose costs
    more than it saves (measured on v5e at 1024x2048x3, 7x7/2 stem: dense
    3.50ms, full-S2D 5.27ms, this W-only form **1.23ms**). H keeps the
    conventional stride. Low-channel strided convs (stems, patch embeds:
    Ci=3) are where XLA's TPU conv lowering otherwise pads the contraction
    depth to the MXU lane count and burns ~40x the nominal FLOPs. Reference
    stems this accelerates: dynamic_resnet.py:255-302 (7x7/2 + deep_stem
    3x3/2), dynamic_convnext.py:178-181 (4x4/4), elastic patchify k==s.

    Weight layout is untouched: ``kernel`` stays ``[kh,kw,Ci,Co]`` and the
    tap reshuffle is traced, so checkpoints/extraction/conversion never see
    it (grads flow back through the pad/reshape to the canonical layout —
    the dW conv gets the same packed-channel speedup). Requires W divisible
    by ``strides[1]`` (guarded by the caller).
    """
    n, h, w, ci = x.shape
    kh, kw, _, co = kernel.shape
    (sh, sw), (ph, pw) = strides, padding
    left = -(-pw // sw)                  # ceil(pw/sw) = -t_min
    t_max = (kw - 1 - pw) // sw
    tw = t_max + left + 1                # W taps on the packed grid
    front = left * sw - pw               # zeros before w along W
    kp = jnp.pad(kernel, ((0, 0), (front, tw * sw - kw - front),
                          (0, 0), (0, 0)))
    kp = kp.reshape(kh, tw, sw, ci, co).reshape(kh, tw, sw * ci, co)
    xp = x.reshape(n, h, w // sw, sw * ci)
    return jax.lax.conv_general_dilated(
        xp, kp, window_strides=(sh, 1),
        padding=((ph, ph), (left, t_max)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _stored_shape(mod: nn.Module, name: str):
    """Shape of an already-created param (apply time), else None (init)."""
    if mod.has_variable("params", name):
        return mod.get_variable("params", name).shape
    return None


class DynConv2d(nn.Module):
    """Conv2d over NHWC with traced-width output masking.

    Equivalent of gaiavision ``DynamicConv2d`` (``type='DynConv2d'`` in
    reference configs, e.g. pspnet_ar50to101v2_gsync.py:19). Padding is
    torch-style symmetric ``dilation*(k-1)//2`` so converted PyTorch
    checkpoints are bit-faithful at borders.

    Width-proportional execution (the gaiavision *slice* model,
    reference dynamic_res_layer.py:154-157, as a STATIC fast path): params
    live at MAX shape, but the executed contraction can be sliced to a
    static bound. The input bound is implicit — when ``x`` carries fewer
    channels than the stored kernel's in-dim, kernel rows are prefix-sliced
    to match (``in_segments`` overrides with per-segment (start, stop) row
    ranges for concat inputs whose first segment shrank). ``out_slice``
    truncates the produced channels. Masking guarantees every active lane's
    value is identical to the MAX program up to float reduction order.
    """

    features: int                      # MAX output channels
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    dilation: Union[int, Tuple[int, int]] = 1
    groups: int = 1
    use_bias: bool = False
    padding: Optional[Union[int, Tuple[int, int]]] = None  # None = torch
    # default dilation*(k-1)//2; explicit int/pair = symmetric pad (0 for
    # patch embeds, matching torch Conv2d padding=0)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = conv_kernel_init

    @nn.compact
    def __call__(self, x: Array, out_mask: Optional[Array] = None,
                 out_slice: Optional[int] = None,
                 in_tail: Optional[int] = None) -> Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        dh, dw = _pair(self.dilation)
        in_ch = x.shape[-1]
        # grouped (depthwise) convs pin the group count to MAX channels, so
        # they cannot take a prefix-sliced input — bounds never reach them
        stored = _stored_shape(self, "kernel") if self.groups == 1 else None
        in_max = stored[2] if stored is not None else in_ch // self.groups
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, in_max, self.features), self.param_dtype)
        if in_ch // self.groups < in_max:
            if in_tail:
                # input = [elastic prefix, static tail]: the tail maps to
                # the LAST ``in_tail`` kernel rows (concat consumers whose
                # first segment shrank under a width bound — the executed
                # analog of the reference's channel_record slicing,
                # reference psp_head.py:235-239)
                head_rows = in_ch - in_tail
                kernel = jnp.concatenate(
                    [kernel[:, :, :head_rows, :],
                     kernel[:, :, in_max - in_tail:, :]], axis=2)
            else:
                kernel = kernel[:, :, :in_ch // self.groups, :]
        if out_slice is not None and out_slice < self.features:
            kernel = kernel[..., :out_slice]
        if self.padding is None:
            pad_h = dh * (kh - 1) // 2
            pad_w = dw * (kw - 1) // 2
        else:
            pad_h, pad_w = _pair(self.padding)
        # low-channel strided convs (stems / patch embeds) take the W-phase
        # space-to-depth formulation: same math, sw*Ci contraction depth
        # instead of an MXU-lane-padded Ci (see space_to_depth_conv)
        if (self.groups == 1 and dh == 1 and dw == 1
                and sw > 1 and kernel.shape[2] <= 8
                and x.ndim == 4 and x.shape[2] % sw == 0
                and (x.shape[2] + 2 * pad_w - kw) // sw + 1 == x.shape[2] // sw):
            y = space_to_depth_conv(
                x.astype(self.dtype), kernel.astype(self.dtype),
                (sh, sw), (pad_h, pad_w))
        else:
            # same-dtype operands; the TPU MXU accumulates bf16 in f32
            # natively
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(sh, sw),
                padding=((pad_h, pad_h), (pad_w, pad_w)),
                rhs_dilation=(dh, dw),
                feature_group_count=self.groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            if y.shape[-1] < self.features:
                bias = bias[:y.shape[-1]]
            y = y + bias.astype(self.dtype)
        if out_mask is not None:
            y = y * out_mask.astype(self.dtype)
        return y


class DynLinear(nn.Module):
    """Linear with traced-width output masking (gaiavision ``DynamicLinear``,
    reference dynamic_convnext.py:25,67-71)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: Array, out_mask: Optional[Array] = None,
                 out_slice: Optional[int] = None) -> Array:
        stored = _stored_shape(self, "kernel")
        in_max = stored[0] if stored is not None else x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (in_max, self.features), self.param_dtype)
        if x.shape[-1] < in_max:
            kernel = kernel[:x.shape[-1], :]
        if out_slice is not None and out_slice < self.features:
            kernel = kernel[:, :out_slice]
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            if y.shape[-1] < self.features:
                bias = bias[:y.shape[-1]]
            y = y + bias.astype(self.dtype)
        if out_mask is not None:
            y = y * out_mask.astype(self.dtype)
        return y


class DynBatchNorm(nn.Module):
    """Masked batch norm; per-channel, so masking IS slice-BN semantics.

    Running statistics update only on active channels (the reference's
    DynBN tracks stats for the active slice only; SURVEY.md §2.9). Under a
    sharded batch the default (``stat_groups=1``) is sync-BN with a global
    group for free: strictly lower-variance statistics than the reference's
    ``group_size=1`` per-device groups. Set ``stat_groups=G`` (G = data-mesh
    shards) to reproduce the reference's per-device group semantics exactly:
    stats are computed per contiguous batch group of B/G samples (groups
    align with the batch sharding, so XLA keeps the reductions device-local
    — no collective), and the running stats track the group average.
    ``group_size`` itself is accepted for config parity only.
    """

    features: int
    momentum: float = 0.9      # decay of the OLD running stat (torch momentum=0.1)
    epsilon: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    group_size: int = 0        # accepted for config parity (see docstring)
    stat_groups: int = 1       # >1: per-batch-group stats (reference
                               # group_size=1 == stat_groups=n_data_shards)

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None, *,
                 use_running_average: bool,
                 update_gate: Optional[Array] = None) -> Array:
        """``update_gate``: optional traced bool — running stats update is
        skipped when False (inactive depth-masked blocks must not pollute
        stats)."""
        c_max = self.features
        # width-bounded fast path: a prefix-sliced input executes BN on the
        # first x.shape[-1] channels only; params/stats stay at MAX shape
        # and the running-stat update writes back into the prefix. Per-
        # channel stats are unchanged by slicing, so active-lane numerics
        # are identical to the MAX program.
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c_max,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c_max,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c_max,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c_max,), jnp.float32))
        if c < c_max:
            scale, bias = scale[:c], bias[:c]
            ra_mean_v, ra_var_v = ra_mean.value[:c], ra_var.value[:c]
        else:
            ra_mean_v, ra_var_v = ra_mean.value, ra_var.value

        g = self.stat_groups if not self.is_initializing() else 1
        if g > 1 and x.shape[0] % g != 0:
            g = 1
        if use_running_average:
            mean, var = ra_mean_v, ra_var_v
            stat_mean = stat_var = None
        elif g > 1:
            per = x.shape[0] // g
            xg = x.astype(jnp.float32).reshape((g, per) + x.shape[1:])
            gaxes = tuple(range(1, xg.ndim - 1))
            mean_g = jnp.mean(xg, axis=gaxes)                 # [G,C]
            mean2_g = jnp.mean(jnp.square(xg), axis=gaxes)
            var_g = jnp.maximum(mean2_g - jnp.square(mean_g), 0.0)
            mean = jnp.repeat(mean_g, per, axis=0)            # [B,C]
            var = jnp.repeat(var_g, per, axis=0)
            n = float(per)
            for s in x.shape[1:-1]:
                n *= s
            stat_mean = jnp.mean(mean_g, axis=0)
            stat_var = jnp.mean(var_g, axis=0) * (n / max(n - 1.0, 1.0))
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=reduce_axes)
            mean2 = jnp.mean(jnp.square(xf), axis=reduce_axes)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            n = 1.0
            for a in reduce_axes:
                n = n * x.shape[a]
            stat_mean = mean
            stat_var = var * (n / max(n - 1.0, 1.0))
        if stat_mean is not None and not self.is_initializing() and \
                self.is_mutable_collection("batch_stats"):
            gate = jnp.ones((c,), bool) if mask is None else (mask > 0)
            if update_gate is not None:
                gate = jnp.logical_and(gate, update_gate)
            new_mean = self.momentum * ra_mean_v \
                + (1 - self.momentum) * stat_mean
            new_var = self.momentum * ra_var_v \
                + (1 - self.momentum) * stat_var
            new_mean = jnp.where(gate, new_mean, ra_mean_v)
            new_var = jnp.where(gate, new_var, ra_var_v)
            if c < c_max:
                ra_mean.value = ra_mean.value.at[:c].set(new_mean)
                ra_var.value = ra_var.value.at[:c].set(new_var)
            else:
                ra_mean.value = new_mean
                ra_var.value = new_var

        # fold normalization into per-channel scale'/bias' and apply in the
        # compute dtype: one fused multiply-add over activations (XLA merges
        # it into the producing conv's epilogue) instead of f32 upcasts
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        fold_scale = inv
        fold_bias = bias - mean * inv
        if mask is not None:
            m = mask.astype(jnp.float32)
            fold_scale = fold_scale * m
            fold_bias = fold_bias * m
        if fold_scale.ndim == 2:    # grouped: per-sample [B,C] stats
            shp = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
            fold_scale = fold_scale.reshape(shp)
            fold_bias = fold_bias.reshape(shp)
        y = x.astype(self.dtype) * fold_scale.astype(self.dtype) \
            + fold_bias.astype(self.dtype)
        return y


class DynLayerNorm(nn.Module):
    """LayerNorm over the *active* channel slice only.

    The masked mean/var divide by the active-channel count, matching
    gaiavision DynLN/ElaLN slice semantics exactly (reference
    dynamic_convnext.py:27,170; SURVEY.md §2.9). ``channels_last`` normalizes
    axis -1 of NHWC / [B,N,C]; ``channels_first`` normalizes axis 1.
    """

    features: int
    epsilon: float = 1e-6
    data_format: str = "channels_last"
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        c_max = self.features
        axis = -1 if self.data_format == "channels_last" else 1
        c = x.shape[axis]    # < c_max under a width-bounded prefix slice
        scale = self.param("scale", nn.initializers.ones, (c_max,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c_max,),
                          jnp.float32)
        if c < c_max:
            scale, bias = scale[:c], bias[:c]
        xf = x.astype(jnp.float32)
        if mask is None:
            mean = jnp.mean(xf, axis=axis, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=axis, keepdims=True)
        else:
            m = mask.astype(jnp.float32)
            if axis == 1:
                m = m.reshape((1, c) + (1,) * (x.ndim - 2))
            cnt = active_count(mask)
            xm = xf * m
            mean = jnp.sum(xm, axis=axis, keepdims=True) / cnt
            var = jnp.sum(jnp.square((xf - mean)) * m, axis=axis, keepdims=True) / cnt
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        sshape = (c,) if axis == -1 else ((1, c) + (1,) * (x.ndim - 2))
        y = y * scale.reshape(sshape) + bias.reshape(sshape)
        if mask is not None:
            m = mask.astype(y.dtype)
            if axis == 1:
                m = m.reshape((1, c) + (1,) * (x.ndim - 2))
            y = y * m
        return y.astype(self.dtype)
