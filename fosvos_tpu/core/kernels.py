"""Pallas TPU kernels for the OSVOS hot ops.

* :func:`class_balanced_bce_pallas` — the reference loss
  (``osvos_layers.py:17-44``) as ONE pass over the logit map: a tiled kernel
  accumulates the four reduction partials (n_pos, n_neg, pos_loss_sum,
  neg_loss_sum) per grid block, with a custom VJP whose backward is the
  closed-form ``d loss_val/dz = labels - sigmoid(z)`` (elementwise, left to
  XLA fusion). The plain-jnp fallback (``ops.class_balanced_cross_entropy_loss``)
  remains the reference implementation; parity is asserted in tests.
* :func:`preprocess_frames_pallas` — fused uint8 -> float32 minus channel
  mean for the serving/eval ingest path (one VMEM pass instead of
  materializing the f32 cast).

Kernels run in interpret mode automatically off-TPU, so the whole test suite
exercises them on CPU.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    return jax.default_backend() == 'tpu'


def _pad_to(x: jax.Array, rows: int) -> jax.Array:
    m = x.shape[0]
    pad = (-m) % rows
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    return x


# ---------------------------------------------------------------------------
# class-balanced BCE
# ---------------------------------------------------------------------------

_BLOCK_ROWS = 256


def _cbce_partials_kernel(z_ref, l_ref, out_ref, *, m_total: int,
                          block_rows: int):
    """Accumulates the 4 partials into out_ref[0, :4] across sequential grid
    steps (TPU grid iterations run in order on a core, so += into the same
    output block is the canonical reduction pattern)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    z = z_ref[:].astype(jnp.float32)
    lab = l_ref[:].astype(jnp.float32)

    row0 = i * block_rows
    gi = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0) + row0
    valid = (gi < m_total).astype(jnp.float32)

    labels = (lab >= 0.5).astype(jnp.float32) * valid
    neg = (1.0 - labels) * valid

    out_gt_zero = (z >= 0).astype(jnp.float32)
    loss_val = z * (labels - out_gt_zero) - jnp.log1p(
        jnp.exp(z - 2.0 * z * out_gt_zero))

    sums = (jnp.sum(labels), jnp.sum(neg),
            jnp.sum(-labels * loss_val), jnp.sum(-neg * loss_val))
    # place the 4 scalars at row 0, lanes 0..3 via masked select
    # (scatter is not lowerable in Mosaic)
    row = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 0)
    col = jax.lax.broadcasted_iota(jnp.int32, out_ref.shape, 1)
    update = jnp.zeros(out_ref.shape, jnp.float32)
    for k, s in enumerate(sums):
        update = jnp.where((row == 0) & (col == k), s, update)
    out_ref[:] = out_ref[:] + update


def _cbce_partials(z2: jax.Array, l2: jax.Array) -> jax.Array:
    """(M, K) logits/labels -> (4,) partial sums via the tiled kernel."""
    m_total = z2.shape[0]
    z2 = _pad_to(z2, _BLOCK_ROWS)
    l2 = _pad_to(l2, _BLOCK_ROWS)
    grid = z2.shape[0] // _BLOCK_ROWS
    k = z2.shape[1]

    out = pl.pallas_call(
        functools.partial(_cbce_partials_kernel, m_total=m_total,
                          block_rows=_BLOCK_ROWS),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK_ROWS, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=not _on_tpu(),
    )(z2, l2)
    return out[0, :4]


def _compose_loss(partials: jax.Array, size: int,
                  size_average: bool) -> jax.Array:
    num_pos, num_neg, loss_pos, loss_neg = (partials[0], partials[1],
                                            partials[2], partials[3])
    num_total = num_pos + num_neg
    final = num_neg / num_total * loss_pos + num_pos / num_total * loss_neg
    if size_average:
        final = final / float(size)
    return final


def _to_2d(x: jax.Array) -> jax.Array:
    """Flatten to (M, W): last dim kept as lanes, everything else rows.
    A trailing singleton channel dim (NHW1 masks) is squeezed first so the
    lane dimension is the image width, not 1."""
    if x.ndim == 1:
        return x[None, :]
    if x.shape[-1] == 1 and x.ndim > 2:
        x = x[..., 0]
    return x.reshape(-1, x.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def class_balanced_bce_pallas(output: jax.Array, label: jax.Array,
                              size_average: bool = True) -> jax.Array:
    partials = _cbce_partials(_to_2d(output), _to_2d(label))
    return _compose_loss(partials, label.size, size_average)


def _cbce_fwd(output, label, size_average):
    partials = _cbce_partials(_to_2d(output), _to_2d(label))
    loss = _compose_loss(partials, label.size, size_average)
    return loss, (output, label, partials)


def _cbce_bwd(size_average, res, g):
    output, label, partials = res
    output = output.astype(jnp.float32)
    labels = (label >= 0.5).astype(jnp.float32)
    num_pos, num_neg = partials[0], partials[1]
    num_total = num_pos + num_neg
    w_pos_term = num_neg / num_total   # weight on sum(-labels * loss_val)
    w_neg_term = num_pos / num_total   # weight on sum(-(1-l) * loss_val)
    # d loss_val / dz = labels - sigmoid(z) (stable closed form)
    dval = labels - jax.nn.sigmoid(output)
    coeff = -(w_pos_term * labels + w_neg_term * (1.0 - labels))
    dz = g * coeff * dval
    if size_average:
        dz = dz / float(label.size)
    return dz.astype(output.dtype), None


class_balanced_bce_pallas.defvjp(_cbce_fwd, _cbce_bwd)


# ---------------------------------------------------------------------------
# frame preprocessing
# ---------------------------------------------------------------------------

def _preprocess_kernel(x_ref, mean_ref, out_ref):
    # Mosaic can't cast uint8 -> f32 directly; hop through int32.
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32)
    out_ref[:] = x - mean_ref[:]


def preprocess_frames_pallas(frames_u8: jax.Array,
                             mean: Tuple[float, float, float]) -> jax.Array:
    """(N, H, W, 3) uint8 -> float32 minus per-channel mean, one VMEM pass.

    The channel mean is materialized as a (1, W*3) row pattern so the kernel
    is a flat 2-D tile op (TPU lanes want the trailing dim contiguous).
    """
    n, h, w, c = frames_u8.shape
    x2 = frames_u8.reshape(n * h, w * c)
    mean_row = jnp.tile(jnp.asarray(mean, jnp.float32), (w,))[None, :]

    rows = 128
    m_total = x2.shape[0]
    x2 = _pad_to(x2, rows)
    grid = x2.shape[0] // rows

    out = pl.pallas_call(
        _preprocess_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, w * c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, w * c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], w * c), jnp.float32),
        interpret=not _on_tpu(),
    )(x2, mean_row)
    return out[:m_total].reshape(n, h, w, c)
