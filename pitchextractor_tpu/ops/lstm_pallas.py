"""Pallas TPU kernel for the LSTM recurrence, with a custom VJP.

The BiLSTM sequence heads dominate the training step (the conv stack is a
handful of large MXU convs; the recurrence is T=192 sequential small matmuls
per direction per layer).  The ``lax.scan`` formulation round-trips the
carry and per-step output through HBM every iteration.  This kernel instead:

- keeps ``h``/``c`` and the (H, 4H) recurrent weight resident in VMEM for the
  entire sequence,
- double-buffers async DMA of the precomputed input projections
  ``x_proj[t] = x[t] @ W_ih + b`` (the big matmul stays outside, where XLA
  tiles it onto the MXU in one shot),
- runs the per-step ``h @ W_hh`` on the MXU and the gate pointwise math on
  the VPU, double-buffering the output DMA back to HBM.

Training support: ``pallas_call`` is not auto-differentiable, so the
recurrence carries a custom VJP (guide: Patterns/Custom VJP).  Under
differentiation the forward kernel emits both hidden and cell histories; the
primal path (inference — no grad traced) runs a separate kernel that never
materialises the cell history, halving output bandwidth.  The backward pass
recomputes the gate activations for *all* steps in one batched matmul and
runs the reverse (dc, dh) chain — the standard BPTT recurrence — in a
reverse-order Pallas kernel (or a ``lax.scan`` fallback).

Gate order is [i, f, g, o], matching models/sequence.py (torch layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # flipped by tests to run the kernel on CPU

# Active multi-device mesh for data-parallel kernel execution (set by the
# Trainer).  pallas_call defines no SPMD partitioning rule, so under a
# sharded mesh the recurrence entry points below wrap themselves in
# ``shard_map`` over the mesh's data axis: every device runs the kernel on
# its local batch shard — exactly the right decomposition for DP (the
# recurrence is independent per batch row).  Under model parallelism the
# Trainer disables the Pallas path entirely (lax.scan fallback).
_ACTIVE_MESH = None


def set_sharding_mesh(mesh) -> None:
    """Install (or clear, with ``None``) the mesh the recurrence kernels
    shard over.  Call with a multi-device pure-DP mesh; single-device meshes
    are treated as None."""
    global _ACTIVE_MESH
    if mesh is not None and mesh.devices.size <= 1:
        mesh = None
    _ACTIVE_MESH = mesh


def _shard_over_batch(local_fn, args, in_specs, out_specs, batch_size):
    """Run ``local_fn`` under shard_map over the active mesh's data axis,
    or directly when no mesh is installed (or the batch doesn't divide the
    data axis — e.g. the Trainer's tiny ``model.init`` dummy)."""
    mesh = _ACTIVE_MESH
    if mesh is None:
        return local_fn(*args)
    from ..parallel.mesh import DATA_AXIS

    n_data = int(mesh.shape[DATA_AXIS])
    if batch_size % n_data != 0:
        return local_fn(*args)
    try:  # jax >= 0.8 promotes shard_map out of experimental (check_vma kwarg)
        from jax import shard_map

        mapped = shard_map(
            local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    except ImportError:  # pragma: no cover - older jaxlib
        from jax.experimental.shard_map import shard_map

        mapped = shard_map(
            local_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
        )
    return mapped(*args)


def _use_bf16_matmuls() -> bool:
    """bf16 gate matmuls inside the kernels (f32 accumulate) — default on.

    Outside the kernels the trainer already runs bf16 matmul precision; an
    f32 ``jnp.dot`` inside Pallas lowers to multi-pass MXU ops, so casting
    the operands to bf16 matches the model-wide mixed-precision semantics
    while shortening the per-step critical path (measured: model recurrence
    fwd 9.36 -> 8.52 ms, fwd+bwd 24.6 -> 24.2 ms at B=64/H=384/T=192,
    results/round2/bench_lstm_leg7*.jsonl).  ``PEX_LSTM_BF16=0`` opts out
    (full-f32 kernels, e.g. for fp32 parity experiments)."""
    import os

    flag = os.environ.get("PEX_LSTM_BF16", "1")
    return flag not in ("0", "false", "off", "")


def pallas_vmem_fits(chains: int, batch: int, hidden_size: int) -> bool:
    """Whether the fused recurrence kernel's per-step working set fits the
    ~16 MB scoped-VMEM limit.  Measured on v5e: chains*B*H = 196608
    (C=2/B=256 or C=4/B=128 at H=384) requests 18 MB and fails to compile;
    98304 (C=4/B=64, C=2/B=128) uses ~9 MB.  Callers fall back to fewer
    chains or the lax.scan path above the budget."""
    return chains * batch * hidden_size <= 100_000


def lane_aligned(hidden_size: int) -> bool:
    """The kernels slice gate blocks of width H on the lane axis; H must
    align to the 128-lane tiling (interpret mode has no tiling)."""
    return _INTERPRET or hidden_size % 128 == 0


def pallas_lstm_available() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _kernel_weight_dtype():
    return jnp.bfloat16 if _use_bf16_matmuls() and not _INTERPRET else jnp.float32


def _use_bf16_streams() -> bool:
    """bf16 HBM streams for the *training* recurrence — default on.

    The leg-9 trace measured ~10 ms/step of f32 glue around the training
    kernels (xp4 layout copies 2.5 ms, pack-building fusions 3.3 ms, BPTT
    custom-call reads ~5 ms) that exists only to feed gradient
    recomputation.  Storing the x-projection input, the h/c histories, and
    the backward pack in bf16 halves those bytes.  The recurrence itself is
    unchanged: the VMEM h/c carry registers and all accumulations stay f32,
    and the inference kernel keeps full-f32 streams (eval numerics are
    untouched).  ``PEX_LSTM_STREAM_BF16=0`` opts out."""
    import os

    flag = os.environ.get("PEX_LSTM_STREAM_BF16", "1")
    return flag not in ("0", "false", "off", "")


def _stream_dtype():
    return jnp.bfloat16 if _use_bf16_streams() and not _INTERPRET else jnp.float32


def _use_bf16_proj() -> bool:
    """bf16 input-projection matmuls for *training* — default on.

    The leg-10 trace put ~19 ms of the 78 ms device step in f32 matmuls
    around the recurrence: the hoisted ``x @ W_ih`` projections (49-90
    TF/s at f32), their weight grads (``f32[768,1536]`` fusions), and the
    f32 ``(T, C, B, 4H)`` packs feeding the kernels.  ``projection_matmul``
    below runs all three matmuls (fwd, dx, dW) with bf16 operands and f32
    accumulation — the same mixed-precision contract as the in-kernel gate
    matmuls — and the projection output is stored bf16 so the stack/flip
    glue and the kernel input stream halve too.  Training-path only: the
    callers (models/sequence.py) gate on ``train=True`` so inference and
    the torch-parity forward stay full-f32.  ``PEX_LSTM_PROJ_BF16=0`` opts
    out."""
    import os

    flag = os.environ.get("PEX_LSTM_PROJ_BF16", "1")
    return flag not in ("0", "false", "off", "")


@jax.custom_vjp
def projection_matmul(x, w):
    """``einsum("btd,dh->bth")`` with bf16 operands / f32 accumulation on
    both the forward and the two backward matmuls (dx, dW).

    A plain ``jnp.einsum`` on cast operands only fixes the forward: autodiff
    re-derives dx/dW with the f32 cotangent and XLA upcasts the bf16 operand,
    so the backward matmuls stay f32 (the leg-10 trace's ``fusion.611-633``).
    The custom VJP forces bf16 operands on all three.  Accumulation is f32
    (``preferred_element_type``); outputs are f32."""
    return jnp.einsum(
        "btd,dh->bth",
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _projection_matmul_fwd(x, w):
    xb = x.astype(jnp.bfloat16)
    wb = w.astype(jnp.bfloat16)
    y = jnp.einsum("btd,dh->bth", xb, wb, preferred_element_type=jnp.float32)
    # residuals kept bf16: halves the saved-activation bytes too
    return y, (xb, wb)


def _projection_matmul_bwd(res, g):
    xb, wb = res
    gb = g.astype(jnp.bfloat16)
    dx = jnp.einsum("bth,dh->btd", gb, wb, preferred_element_type=jnp.float32)
    dw = jnp.einsum("btd,bth->dh", xb, gb, preferred_element_type=jnp.float32)
    return dx, dw


projection_matmul.defvjp(_projection_matmul_fwd, _projection_matmul_bwd)


@jax.custom_vjp
def _lstm_recurrence(x_proj, w_hh):
    # inference path (no grad traced): skip the cell-state history entirely
    return _multichain_kernel_call(x_proj[:, None], w_hh[None], save_carry=False)[:, 0]


def _lstm_fwd(x_proj, w_hh):
    hs, cs = _multichain_kernel_call(x_proj[:, None], w_hh[None], save_carry=True)
    # residuals in the (possibly bf16) stream dtype; primal output stays f32.
    # The zero-size marker records the primal input dtype (bf16 under the
    # projection flag, f32 otherwise) so the backward can emit dx directly
    # in that dtype.
    res = (x_proj.astype(hs.dtype), w_hh, hs[:, 0], cs[:, 0], jnp.zeros((0,), x_proj.dtype))
    return hs[:, 0].astype(jnp.float32), res


def _lstm_bwd_core(x_proj, w_hh, hs, cs, g):
    """BPTT: batched gate recomputation + reverse scan for the carry chain."""
    # residuals may arrive in the bf16 stream dtype; the scan carries f32
    x_proj, hs, cs, g = (a.astype(jnp.float32) for a in (x_proj, hs, cs, g))
    T, B, H = hs.shape
    zeros = jnp.zeros((1, B, H), hs.dtype)
    h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros, cs[:-1]], axis=0)

    # recompute all gate activations in one shot (MXU matmul over T·B rows)
    gates = x_proj + jnp.einsum("tbh,hg->tbg", h_prev, w_hh)
    gi = jax.nn.sigmoid(gates[..., :H])
    gf = jax.nn.sigmoid(gates[..., H : 2 * H])
    gg = jnp.tanh(gates[..., 2 * H : 3 * H])
    go = jax.nn.sigmoid(gates[..., 3 * H :])
    tanh_c = jnp.tanh(cs)

    w_hh_T = w_hh.T  # (4H, H)

    def step(carry, inp):
        dc_next, dh_rec = carry
        g_t, gi_t, gf_t, gg_t, go_t, tanh_c_t, c_prev_t = inp
        dh = g_t + dh_rec
        dc = dh * go_t * (1.0 - tanh_c_t**2) + dc_next
        do = dh * tanh_c_t * go_t * (1.0 - go_t)
        di = dc * gg_t * gi_t * (1.0 - gi_t)
        df = dc * c_prev_t * gf_t * (1.0 - gf_t)
        dgg = dc * gi_t * (1.0 - gg_t**2)
        dgates = jnp.concatenate([di, df, dgg, do], axis=-1)
        dh_rec_new = dgates @ w_hh_T
        dc_prev = dc * gf_t
        return (dc_prev, dh_rec_new), dgates

    init = (jnp.zeros((B, H), hs.dtype), jnp.zeros((B, H), hs.dtype))
    _, dgates = lax.scan(step, init, (g, gi, gf, gg, go, tanh_c, c_prev), reverse=True)

    dx_proj = dgates
    dw_hh = jnp.einsum("tbh,tbg->hg", h_prev, dgates)
    return dx_proj, dw_hh


def _use_pallas_bptt() -> bool:
    """Default ON: the round-2 microbench (tools/bench_lstm.py, real chip)
    measured the Pallas BPTT kernel clearly ahead of the batched-recompute +
    reverse-scan backward (fwd+bwd model recurrence 30.3 ms vs 35.7 at C=2,
    26.6 vs 32.6 at C=4).  ``PEX_DISABLE_PALLAS_BPTT`` opts out."""
    import os

    return not os.environ.get("PEX_DISABLE_PALLAS_BPTT")


def _lstm_bwd(residuals, g):
    x_proj, w_hh, hs, cs, dt_marker = residuals
    if _use_pallas_bptt() or _INTERPRET:
        dx, dw = _multichain_bwd_pallas(
            x_proj[:, None], w_hh[None], hs[:, None], cs[:, None], g[:, None],
            out_dtype=dt_marker.dtype,
        )
        return dx[:, 0], dw[0]
    dx, dw = _lstm_bwd_core(x_proj, w_hh, hs, cs, g)
    return dx.astype(dt_marker.dtype), dw


_lstm_recurrence.defvjp(_lstm_fwd, _lstm_bwd)


# ---------------------------------------------------------------------------
# Fused bidirectional kernel: both directions advance in the same sequential
# loop (chain axis C=2), amortising the per-step DMA/loop overhead that
# dominates at these sizes.  Chain 0 runs forward time order; chain 1 runs on
# time-flipped inputs (classic BiLSTM trick), so one kernel serves both.
# ---------------------------------------------------------------------------


def _multichain_kernel(xp_ref, whh_ref, h_out_ref, c_out_ref, xbuf, hbuf, cbuf,
                       h, c, in_sems, hout_sems, cout_sems, *, T, C):
    """Training forward: xp_ref (T, C, B, 4H) HBM; whh_ref (C, H, 4H) VMEM;
    h_out_ref / c_out_ref (T, C, B, H) HBM (the cell history feeds BPTT).

    Measured note: a combined per-step [h | c] (C, B, 2H) output stream was
    tried and benched SLOWER than two contiguous stores + two DMA issues
    (12.9 vs 11.7 ms model recurrence — the strided lane writes into the
    wide buffer cost more than the saved DMA issue), so separate streams
    stay.  Inference uses ``_multichain_inference_kernel`` instead, which
    skips the cell history entirely (10.5 ms).
    """

    def in_dma(slot, i):
        return pltpu.make_async_copy(xp_ref.at[i], xbuf.at[slot], in_sems.at[slot])

    def h_dma(slot, i):
        return pltpu.make_async_copy(hbuf.at[slot], h_out_ref.at[i], hout_sems.at[slot])

    def c_dma(slot, i):
        return pltpu.make_async_copy(cbuf.at[slot], c_out_ref.at[i], cout_sems.at[slot])

    h[:] = jnp.zeros_like(h)
    c[:] = jnp.zeros_like(c)
    in_dma(0, 0).start()

    def body(i, _):
        slot = lax.rem(i, 2)
        next_slot = lax.rem(i + 1, 2)

        @pl.when(i + 1 < T)
        def _():
            in_dma(next_slot, i + 1).start()

        in_dma(slot, i).wait()

        _advance_chains(xbuf, whh_ref, h, c, slot, C)

        # reclaim the output slots written two steps ago before overwriting
        @pl.when(i >= 2)
        def _():
            h_dma(slot, i - 2).wait()
            c_dma(slot, i - 2).wait()

        hbuf[slot] = h[:].astype(hbuf.dtype)
        cbuf[slot] = c[:].astype(cbuf.dtype)
        h_dma(slot, i).start()
        c_dma(slot, i).start()
        return ()

    lax.fori_loop(0, T, body, ())

    @pl.when(T >= 2)
    def _():
        h_dma(lax.rem(T - 2, 2), T - 2).wait()
        c_dma(lax.rem(T - 2, 2), T - 2).wait()

    h_dma(lax.rem(T - 1, 2), T - 1).wait()
    c_dma(lax.rem(T - 1, 2), T - 1).wait()


def _advance_chains(xbuf, whh_ref, h, c, slot, C):
    """One LSTM step for all C chains (static unroll); updates h/c in place.

    ``xbuf`` may hold the bf16 input stream; the gate math and the h/c
    carry registers are always f32 (the dot accumulates f32 either way)."""
    H = h.shape[-1]
    for k in range(C):
        w = whh_ref[k]
        hk = h[k].astype(w.dtype) if w.dtype != h.dtype else h[k]
        xk = xbuf[slot, k]
        if xk.dtype != jnp.float32:
            xk = xk.astype(jnp.float32)
        gates = xk + jnp.dot(hk, w, preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(gates[:, :H])
        gf = jax.nn.sigmoid(gates[:, H : 2 * H])
        gg = jnp.tanh(gates[:, 2 * H : 3 * H])
        go = jax.nn.sigmoid(gates[:, 3 * H :])
        c[k] = gf * c[k] + gi * gg
        h[k] = go * jnp.tanh(c[k])


def _multichain_inference_kernel(xp_ref, whh_ref, h_out_ref, xbuf, hbuf, h, c,
                                 in_sems, hout_sems, *, T, C):
    """Inference forward: as the training kernel but the cell-state history
    is never written to HBM — h is the only output stream (half the output
    bandwidth; 10.5 vs 11.7 ms model recurrence measured at C=4)."""

    def in_dma(slot, i):
        return pltpu.make_async_copy(xp_ref.at[i], xbuf.at[slot], in_sems.at[slot])

    def h_dma(slot, i):
        return pltpu.make_async_copy(hbuf.at[slot], h_out_ref.at[i], hout_sems.at[slot])

    h[:] = jnp.zeros_like(h)
    c[:] = jnp.zeros_like(c)
    in_dma(0, 0).start()

    def body(i, _):
        slot = lax.rem(i, 2)
        next_slot = lax.rem(i + 1, 2)

        @pl.when(i + 1 < T)
        def _():
            in_dma(next_slot, i + 1).start()

        in_dma(slot, i).wait()

        _advance_chains(xbuf, whh_ref, h, c, slot, C)

        @pl.when(i >= 2)
        def _():
            h_dma(slot, i - 2).wait()

        hbuf[slot] = h[:]
        h_dma(slot, i).start()
        return ()

    lax.fori_loop(0, T, body, ())

    @pl.when(T >= 2)
    def _():
        h_dma(lax.rem(T - 2, 2), T - 2).wait()

    h_dma(lax.rem(T - 1, 2), T - 1).wait()


def _multichain_kernel_call(x_proj, w_hh, save_carry):
    """x_proj: (T, C, B, 4H); w_hh: (C, H, 4H).

    -> (hs, cs) each (T, C, B, H) when ``save_carry``, else hs only.
    """
    T, C, B, H4 = x_proj.shape
    H = H4 // 4
    common = dict(
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        interpret=_INTERPRET,
    )
    if save_carry:
        # training forward: the x input and the h/c history streams ride HBM
        # in the stream dtype (bf16 by default); carry registers stay f32
        sd = _stream_dtype()
        ss = jnp.dtype(sd).itemsize
        args = (x_proj.astype(sd), w_hh.astype(_kernel_weight_dtype()))
        kernel = functools.partial(_multichain_kernel, T=T, C=C)
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((T, C, B, H), sd),
                jax.ShapeDtypeStruct((T, C, B, H), sd),
            ),
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((2, C, B, H4), sd),
                pltpu.VMEM((2, C, B, H), sd),
                pltpu.VMEM((2, C, B, H), sd),
                pltpu.VMEM((C, B, H), jnp.float32),
                pltpu.VMEM((C, B, H), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * T * C * B * H * H4,
                bytes_accessed=(T * C * B * H4 + 2 * T * C * B * H) * ss
                + C * H * H4 * 4,
                transcendentals=4 * T * C * B * H,
            ),
            **common,
        )(*args)
    args = (x_proj.astype(jnp.float32), w_hh.astype(_kernel_weight_dtype()))
    kernel = functools.partial(_multichain_inference_kernel, T=T, C=C)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, C, B, H), jnp.float32),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, C, B, H4), jnp.float32),
            pltpu.VMEM((2, C, B, H), jnp.float32),
            pltpu.VMEM((C, B, H), jnp.float32),
            pltpu.VMEM((C, B, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * C * B * H * H4,
            bytes_accessed=(T * C * B * H4 + T * C * B * H + C * H * H4) * 4,
            transcendentals=4 * T * C * B * H,
        ),
        **common,
    )(*args)


@jax.custom_vjp
def _bilstm_recurrence(x_proj2, w_hh2):
    # inference path (no grad traced): skip the cell-state history entirely
    return _multichain_kernel_call(x_proj2, w_hh2, save_carry=False)


def _bilstm_fwd(x_proj2, w_hh2):
    hs, cs = _multichain_kernel_call(x_proj2, w_hh2, save_carry=True)
    # residuals kept in the (possibly bf16) stream dtype; primal output f32;
    # the zero-size marker records the primal input dtype for the backward
    res = (x_proj2.astype(hs.dtype), w_hh2, hs, cs, jnp.zeros((0,), x_proj2.dtype))
    return hs.astype(jnp.float32), res


def _bptt_kernel(pack_ref, whhT_ref, dgates_ref, pbuf, obuf, dc, dh_rec,
                 in_sems, out_sems, *, T, C):
    """Reverse-time BPTT recurrence.

    pack_ref: (T, C, B, 7H) HBM — per step [g, gi, gf, gg, go, tanh_c,
    c_prev] concatenated on the last axis (precomputed batched outside).
    whhT_ref: (C, 4H, H) VMEM.  dgates_ref: (T, C, B, 4H) HBM output.
    Carries dc/dh_rec (C, B, H) stay in VMEM for the whole sequence.
    """

    def in_dma(slot, i):
        return pltpu.make_async_copy(pack_ref.at[i], pbuf.at[slot], in_sems.at[slot])

    def out_dma(slot, i):
        return pltpu.make_async_copy(obuf.at[slot], dgates_ref.at[i], out_sems.at[slot])

    dc[:] = jnp.zeros_like(dc)
    dh_rec[:] = jnp.zeros_like(dh_rec)
    in_dma(0, T - 1).start()

    def body(k, _):
        i = T - 1 - k  # reverse time
        slot = lax.rem(k, 2)
        next_slot = lax.rem(k + 1, 2)

        @pl.when(k + 1 < T)
        def _():
            in_dma(next_slot, i - 1).start()

        in_dma(slot, i).wait()

        # reclaim this output slot (written two reverse-steps ago) once,
        # before any chain writes into it
        @pl.when(k >= 2)
        def _():
            out_dma(slot, i + 2).wait()

        H = dc.shape[-1]
        for c in range(C):  # static unroll over chains
            pk = pbuf[slot, c]
            if pk.dtype != jnp.float32:  # bf16 input stream; f32 gate math
                pk = pk.astype(jnp.float32)
            g_t = pk[:, 0 * H : 1 * H]
            gi = pk[:, 1 * H : 2 * H]
            gf = pk[:, 2 * H : 3 * H]
            gg = pk[:, 3 * H : 4 * H]
            go = pk[:, 4 * H : 5 * H]
            tanh_c = pk[:, 5 * H : 6 * H]
            c_prev = pk[:, 6 * H : 7 * H]

            dh = g_t + dh_rec[c]
            dct = dh * go * (1.0 - tanh_c * tanh_c) + dc[c]
            do = dh * tanh_c * go * (1.0 - go)
            di = dct * gg * gi * (1.0 - gi)
            df = dct * c_prev * gf * (1.0 - gf)
            dgg = dct * gi * (1.0 - gg * gg)
            dgates = jnp.concatenate([di, df, dgg, do], axis=-1)

            obuf[slot, c] = dgates.astype(obuf.dtype)
            wT = whhT_ref[c]
            dg = dgates.astype(wT.dtype) if wT.dtype != dgates.dtype else dgates
            dh_rec[c] = jnp.dot(dg, wT, preferred_element_type=jnp.float32)
            dc[c] = dct * gf

        out_dma(slot, i).start()
        return ()

    lax.fori_loop(0, T, body, ())

    @pl.when(T >= 2)
    def _():
        out_dma(lax.rem(T - 2, 2), 1).wait()

    out_dma(lax.rem(T - 1, 2), 0).wait()


def _bptt_kernel_call(pack, w_hh_T, out_dtype=jnp.float32):
    """pack: (T, C, B, 7H); w_hh_T: (C, 4H, H) -> dgates (T, C, B, 4H).

    ``out_dtype`` is the dgates stream dtype: when the kernel input (the
    primal x_proj) was bf16, the dx it produces rides HBM in bf16 too —
    the downstream dW_ih / dx matmuls (projection_matmul's VJP) consume
    bf16 operands anyway.  The in-kernel dgates math stays f32."""
    T, C, B, H7 = pack.shape
    H = H7 // 7
    kernel = functools.partial(_bptt_kernel, T=T, C=C)
    out_size = jnp.dtype(out_dtype).itemsize
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, C, B, 4 * H), out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, C, B, H7), pack.dtype),
            pltpu.VMEM((2, C, B, 4 * H), out_dtype),
            pltpu.VMEM((C, B, H), jnp.float32),
            pltpu.VMEM((C, B, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * C * B * 4 * H * H,
            bytes_accessed=T * C * B * H7 * pack.dtype.itemsize
            + T * C * B * 4 * H * out_size
            + C * 4 * H * H * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(pack, w_hh_T.astype(_kernel_weight_dtype()))


def _multichain_bwd_pallas(x_proj2, w_hh2, hs, cs, g, out_dtype=jnp.float32):
    """Pallas BPTT for the multichain recurrence.

    x_proj2/hs/cs/g: (T, C, B, ·); w_hh2: (C, H, 4H).
    Returns (dx_proj (T,C,B,4H) in ``out_dtype``, dw_hh (C,H,4H) f32).
    """
    T, C, B, H = hs.shape
    sd = hs.dtype  # stream dtype of the residuals (bf16 by default)
    zeros = jnp.zeros((1, C, B, H), sd)
    h_prev = jnp.concatenate([zeros, hs[:-1]], axis=0)
    c_prev = jnp.concatenate([zeros, cs[:-1]], axis=0)

    # batched gate recomputation — one big MXU matmul over T·C·B rows
    # (f32 gate math; matches the forward kernel's bf16-operand dot)
    gates = x_proj2.astype(jnp.float32) + jnp.einsum(
        "tcbh,chg->tcbg", h_prev, w_hh2, preferred_element_type=jnp.float32
    )
    gi = jax.nn.sigmoid(gates[..., :H])
    gf = jax.nn.sigmoid(gates[..., H : 2 * H])
    gg = jnp.tanh(gates[..., 2 * H : 3 * H])
    go = jax.nn.sigmoid(gates[..., 3 * H :])
    tanh_c = jnp.tanh(cs.astype(jnp.float32))

    # the pack rides HBM once out and once back in through the reverse
    # kernel — store it in the stream dtype
    pack = jnp.concatenate(
        [p.astype(sd) for p in (g, gi, gf, gg, go, tanh_c, c_prev)], axis=-1
    )
    w_hh_T = jnp.swapaxes(w_hh2, 1, 2)  # (C, 4H, H)
    dgates = _bptt_kernel_call(pack, w_hh_T, out_dtype=out_dtype)  # (T, C, B, 4H)

    dx_proj = dgates
    dw_hh = jnp.einsum(
        "tcbh,tcbg->chg", h_prev, dgates, preferred_element_type=jnp.float32
    )
    return dx_proj, dw_hh


def _bilstm_bwd(residuals, g):
    x_proj2, w_hh2, hs, cs, dt_marker = residuals
    if _use_pallas_bptt() or _INTERPRET:
        return _multichain_bwd_pallas(x_proj2, w_hh2, hs, cs, g, out_dtype=dt_marker.dtype)
    to_chain = lambda a: jnp.swapaxes(a, 0, 1)  # (T,C,...) -> (C,T,...)
    dx, dw = jax.vmap(_lstm_bwd_core)(
        to_chain(x_proj2), w_hh2, to_chain(hs), to_chain(cs), to_chain(g)
    )
    return jnp.swapaxes(dx, 0, 1).astype(dt_marker.dtype), dw


_bilstm_recurrence.defvjp(_bilstm_fwd, _bilstm_bwd)


def bilstm_layer_pallas(
    x_proj: jnp.ndarray, w_hh_fwd: jnp.ndarray, w_hh_bwd: jnp.ndarray
) -> jnp.ndarray:
    """Fused bidirectional recurrence.

    Args:
      x_proj: (T, 2, B, 4H) — chain 0: forward-direction input projections in
        forward time order; chain 1: backward-direction projections, already
        time-flipped.
      w_hh_fwd / w_hh_bwd: (H, 4H) recurrent weights per direction.

    Returns: (T, B, 2H) — [forward states, backward states (re-flipped)],
    matching ``concat([fwd, flip(bwd)], -1)``.
    """
    w2 = jnp.stack([w_hh_fwd, w_hh_bwd], axis=0)
    hs = multichain_lstm_pallas(x_proj, w2)  # (T, 2, B, H); DP-sharded if mesh set
    fwd = hs[:, 0]
    bwd = jnp.flip(hs[:, 1], axis=0)
    return jnp.concatenate([fwd, bwd], axis=-1)


def _pad_batch(x_proj: jnp.ndarray, align: int = 8):
    """Pad the batch axis (second-to-last) to the f32 sublane tiling."""
    B = x_proj.shape[-2]
    padded = ((B + align - 1) // align) * align
    if padded == B:
        return x_proj, B
    widths = [(0, 0)] * (x_proj.ndim - 2) + [(0, padded - B), (0, 0)]
    return jnp.pad(x_proj, widths), B


def lstm_layer_pallas(x_proj: jnp.ndarray, w_hh: jnp.ndarray, reverse: bool = False) -> jnp.ndarray:
    """Differentiable LSTM recurrence over precomputed input projections.

    Args:
      x_proj: (T, B, 4H) — ``x @ W_ih + b_ih + b_hh`` per step.
      w_hh: (H, 4H) recurrent weights.
      reverse: process time back-to-front (outputs stay time-aligned).

    Returns: (T, B, H) hidden states.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    def local(xp, w):
        xp, B = _pad_batch(xp)
        if reverse:
            out = jnp.flip(_lstm_recurrence(jnp.flip(xp, axis=0), w), axis=0)
        else:
            out = _lstm_recurrence(xp, w)
        return out[:, :B]

    return _shard_over_batch(
        local,
        (x_proj, w_hh),
        in_specs=(P(None, DATA_AXIS, None), P()),
        out_specs=P(None, DATA_AXIS, None),
        batch_size=x_proj.shape[1],
    )


def multichain_lstm_pallas(x_proj: jnp.ndarray, w_hh: jnp.ndarray) -> jnp.ndarray:
    """Generic C-chain fused recurrence: (T, C, B, 4H) x (C, H, 4H) -> (T, C, B, H).

    Chains are independent LSTMs advanced in the same sequential loop — used
    for direction fusion (C=2) and cross-head fusion (C=4, models/jdc.py).
    Time-flipped chains must be flipped by the caller before and after.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    def local(xp, w):
        xp, B = _pad_batch(xp)
        return _bilstm_recurrence(xp, w)[:, :, :B]

    return _shard_over_batch(
        local,
        (x_proj, w_hh),
        in_specs=(P(None, None, DATA_AXIS, None), P()),
        out_specs=P(None, None, DATA_AXIS, None),
        batch_size=x_proj.shape[2],
    )


# ---------------------------------------------------------------------------
# Direction-aware multichain kernels (round 3).
#
# The stacked-pack path above needs the caller to interleave-copy the four
# (T, B, 4H) projections into one (T, C, B, 4H) pack, time-flipping the
# backward chains, and to flip the backward outputs again — the round-3
# trace measured ~4 ms/step of stack/flip/relayout glue (jdc.py:176-185 +
# copy.423).  These variants instead take the per-chain projection arrays
# directly (C separate HBM refs, no pack) and give every chain its own time
# direction in the DMA index math: backward chains read x_proj[T-1-i] and
# write h/c at T-1-i, so inputs AND outputs stay in real time order and no
# flip or interleave ever materializes.  Cost: C input DMA issues per step
# instead of one (each (B, 4H) — still large enough to amortise).
# ---------------------------------------------------------------------------


def _dir_idx(i, T, d):
    return (T - 1 - i) if d else i


def _multichain_dir_kernel(*refs, T, C, dirs, save_carry):
    """refs: C x xp_ref (T,B,4H) HBM, whh_ref (C,H,4H) VMEM, h_out (T,C,B,H),
    [c_out (T,C,B,H)], scratch: xbuf (2,C,B,4H), hbuf, [cbuf], h, c,
    in_sems (2,C), hout_sems (2,C), [cout_sems (2,C)]."""
    xp_refs = refs[:C]
    whh_ref = refs[C]
    if save_carry:
        (h_out_ref, c_out_ref, xbuf, hbuf, cbuf, h, c,
         in_sems, hout_sems, cout_sems) = refs[C + 1 :]
    else:
        (h_out_ref, xbuf, hbuf, h, c, in_sems, hout_sems) = refs[C + 1 :]
        c_out_ref = cbuf = cout_sems = None

    def in_dma(slot, i, k):
        return pltpu.make_async_copy(
            xp_refs[k].at[_dir_idx(i, T, dirs[k])], xbuf.at[slot, k], in_sems.at[slot, k]
        )

    def h_dma(slot, i, k):
        return pltpu.make_async_copy(
            hbuf.at[slot, k], h_out_ref.at[_dir_idx(i, T, dirs[k]), k], hout_sems.at[slot, k]
        )

    def c_dma(slot, i, k):
        return pltpu.make_async_copy(
            cbuf.at[slot, k], c_out_ref.at[_dir_idx(i, T, dirs[k]), k], cout_sems.at[slot, k]
        )

    h[:] = jnp.zeros_like(h)
    c[:] = jnp.zeros_like(c)
    for k in range(C):
        in_dma(0, 0, k).start()

    def body(i, _):
        slot = lax.rem(i, 2)
        next_slot = lax.rem(i + 1, 2)

        @pl.when(i + 1 < T)
        def _():
            for k in range(C):
                in_dma(next_slot, i + 1, k).start()

        for k in range(C):
            in_dma(slot, i, k).wait()

        _advance_chains(xbuf, whh_ref, h, c, slot, C)

        # reclaim the output slots written two steps ago before overwriting
        @pl.when(i >= 2)
        def _():
            for k in range(C):
                h_dma(slot, i - 2, k).wait()
                if save_carry:
                    c_dma(slot, i - 2, k).wait()

        hbuf[slot] = h[:].astype(hbuf.dtype)
        if save_carry:
            cbuf[slot] = c[:].astype(cbuf.dtype)
        for k in range(C):
            h_dma(slot, i, k).start()
            if save_carry:
                c_dma(slot, i, k).start()
        return ()

    lax.fori_loop(0, T, body, ())

    @pl.when(T >= 2)
    def _():
        for k in range(C):
            h_dma(lax.rem(T - 2, 2), T - 2, k).wait()
            if save_carry:
                c_dma(lax.rem(T - 2, 2), T - 2, k).wait()

    for k in range(C):
        h_dma(lax.rem(T - 1, 2), T - 1, k).wait()
        if save_carry:
            c_dma(lax.rem(T - 1, 2), T - 1, k).wait()


def _multichain_dir_call(x_projs, w_hh, dirs, save_carry):
    """x_projs: tuple of C (T, B, 4H) arrays; w_hh (C, H, 4H).

    -> (hs, cs) each (T, C, B, H) in REAL time order when ``save_carry``,
    else hs only.
    """
    C = len(x_projs)
    T, B, H4 = x_projs[0].shape
    H = H4 // 4
    sd = _stream_dtype() if save_carry else jnp.float32
    ss = jnp.dtype(sd).itemsize
    args = tuple(x.astype(sd) for x in x_projs) + (w_hh.astype(_kernel_weight_dtype()),)
    kernel = functools.partial(
        _multichain_dir_kernel, T=T, C=C, dirs=tuple(dirs), save_carry=save_carry
    )
    n_out = 2 if save_carry else 1
    scratch = [
        pltpu.VMEM((2, C, B, H4), sd),  # xbuf
        pltpu.VMEM((2, C, B, H), sd),  # hbuf
    ]
    if save_carry:
        scratch.append(pltpu.VMEM((2, C, B, H), sd))  # cbuf
    scratch += [
        pltpu.VMEM((C, B, H), jnp.float32),  # h carry
        pltpu.VMEM((C, B, H), jnp.float32),  # c carry
        pltpu.SemaphoreType.DMA((2, C)),  # in
        pltpu.SemaphoreType.DMA((2, C)),  # h out
    ]
    if save_carry:
        scratch.append(pltpu.SemaphoreType.DMA((2, C)))  # c out
    out_shape = tuple(jax.ShapeDtypeStruct((T, C, B, H), sd) for _ in range(n_out))
    out_specs = tuple(pl.BlockSpec(memory_space=pl.ANY) for _ in range(n_out))
    if n_out == 1:
        out_shape, out_specs = out_shape[0], out_specs[0]
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        out_specs=out_specs,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * C
        + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * C * B * H * H4,
            bytes_accessed=(T * C * B * H4 + n_out * T * C * B * H) * ss
            + C * H * H4 * 4,
            transcendentals=4 * T * C * B * H,
        ),
        interpret=_INTERPRET,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _dir_recurrence(dirs, x_projs, w_hh):
    # inference path (no grad traced): no cell-state history
    return _multichain_dir_call(x_projs, w_hh, dirs, save_carry=False)


def _dir_fwd(dirs, x_projs, w_hh):
    hs, cs = _multichain_dir_call(x_projs, w_hh, dirs, save_carry=True)
    res = (
        tuple(x.astype(hs.dtype) for x in x_projs),
        w_hh,
        hs,
        cs,
        jnp.zeros((0,), x_projs[0].dtype),
    )
    return hs.astype(jnp.float32), res


def _bptt_dir_kernel(pack_ref, whhT_ref, dgates_ref, pbuf, obuf, dc, dh_rec,
                     in_sems, out_sems, *, T, C, dirs):
    """Direction-aware BPTT: loop index k walks each chain's OWN reverse
    time — real index T-1-k for forward chains, k for backward chains (a
    backward chain's recurrence ran from real T-1 down to 0, so its BPTT
    walks real time upward).  pack/dgates stay in real time order."""

    def bidx(k, c):
        # chain c's real-time index at reverse-loop step k
        return _dir_idx(k, T, 0 if dirs[c] else 1)

    def in_dma(slot, k, c):
        return pltpu.make_async_copy(
            pack_ref.at[bidx(k, c), c], pbuf.at[slot, c], in_sems.at[slot, c]
        )

    def out_dma(slot, k, c):
        return pltpu.make_async_copy(
            obuf.at[slot, c], dgates_ref.at[bidx(k, c), c], out_sems.at[slot, c]
        )

    dc[:] = jnp.zeros_like(dc)
    dh_rec[:] = jnp.zeros_like(dh_rec)
    for c in range(C):
        in_dma(0, 0, c).start()

    def body(k, _):
        slot = lax.rem(k, 2)
        next_slot = lax.rem(k + 1, 2)

        @pl.when(k + 1 < T)
        def _():
            for c in range(C):
                in_dma(next_slot, k + 1, c).start()

        for c in range(C):
            in_dma(slot, k, c).wait()

        @pl.when(k >= 2)
        def _():
            for c in range(C):
                out_dma(slot, k - 2, c).wait()

        H = dc.shape[-1]
        for c in range(C):  # static unroll over chains
            pk = pbuf[slot, c]
            if pk.dtype != jnp.float32:
                pk = pk.astype(jnp.float32)
            g_t = pk[:, 0 * H : 1 * H]
            gi = pk[:, 1 * H : 2 * H]
            gf = pk[:, 2 * H : 3 * H]
            gg = pk[:, 3 * H : 4 * H]
            go = pk[:, 4 * H : 5 * H]
            tanh_c = pk[:, 5 * H : 6 * H]
            c_prev = pk[:, 6 * H : 7 * H]

            dh = g_t + dh_rec[c]
            dct = dh * go * (1.0 - tanh_c * tanh_c) + dc[c]
            do = dh * tanh_c * go * (1.0 - go)
            di = dct * gg * gi * (1.0 - gi)
            df = dct * c_prev * gf * (1.0 - gf)
            dgg = dct * gi * (1.0 - gg * gg)
            dgates = jnp.concatenate([di, df, dgg, do], axis=-1)

            obuf[slot, c] = dgates.astype(obuf.dtype)
            wT = whhT_ref[c]
            dg = dgates.astype(wT.dtype) if wT.dtype != dgates.dtype else dgates
            dh_rec[c] = jnp.dot(dg, wT, preferred_element_type=jnp.float32)
            dc[c] = dct * gf

        for c in range(C):
            out_dma(slot, k, c).start()
        return ()

    lax.fori_loop(0, T, body, ())

    @pl.when(T >= 2)
    def _():
        for c in range(C):
            out_dma(lax.rem(T - 2, 2), T - 2, c).wait()

    for c in range(C):
        out_dma(lax.rem(T - 1, 2), T - 1, c).wait()


def _bptt_dir_call(pack, w_hh_T, dirs, out_dtype=jnp.float32):
    T, C, B, H7 = pack.shape
    H = H7 // 7
    kernel = functools.partial(_bptt_dir_kernel, T=T, C=C, dirs=tuple(dirs))
    out_size = jnp.dtype(out_dtype).itemsize
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((T, C, B, 4 * H), out_dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, C, B, H7), pack.dtype),
            pltpu.VMEM((2, C, B, 4 * H), out_dtype),
            pltpu.VMEM((C, B, H), jnp.float32),
            pltpu.VMEM((C, B, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2, C)),
            pltpu.SemaphoreType.DMA((2, C)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * C * B * 4 * H * H,
            bytes_accessed=T * C * B * H7 * pack.dtype.itemsize
            + T * C * B * 4 * H * out_size
            + C * 4 * H * H * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(pack, w_hh_T.astype(_kernel_weight_dtype()))


def _shift_per_dir(a, dirs):
    """Previous-state view of a real-time-ordered (T, C, B, ·) history:
    forward chains see a[t-1] (zero at t=0), backward chains a[t+1]
    (zero at t=T-1)."""
    zeros = jnp.zeros_like(a[:1])
    down = jnp.concatenate([zeros, a[:-1]], axis=0)  # fwd chains
    up = jnp.concatenate([a[1:], zeros], axis=0)  # bwd chains
    mask = jnp.asarray(dirs, dtype=bool)[None, :, None, None]
    return jnp.where(mask, up, down)


def _dir_bwd(dirs, residuals, g):
    x_projs, w_hh, hs, cs, dt_marker = residuals
    T, C, B, H = hs.shape
    sd = hs.dtype

    # batched gate recomputation: y = hs @ w_hh once, then the per-chain
    # previous-state shift applies to y (matmul commutes with time shift)
    y = jnp.einsum("tcbh,chg->tcbg", hs, w_hh, preferred_element_type=jnp.float32)
    x4 = jnp.stack(x_projs, axis=1).astype(jnp.float32)  # (T, C, B, 4H)
    gates = x4 + _shift_per_dir(y, dirs)
    gi = jax.nn.sigmoid(gates[..., :H])
    gf = jax.nn.sigmoid(gates[..., H : 2 * H])
    gg = jnp.tanh(gates[..., 2 * H : 3 * H])
    go = jax.nn.sigmoid(gates[..., 3 * H :])
    tanh_c = jnp.tanh(cs.astype(jnp.float32))
    c_prev = _shift_per_dir(cs, dirs).astype(jnp.float32)

    pack = jnp.concatenate(
        [p.astype(sd) for p in (g, gi, gf, gg, go, tanh_c, c_prev)], axis=-1
    )
    w_hh_T = jnp.swapaxes(w_hh, 1, 2)  # (C, 4H, H)
    dgates = _bptt_dir_call(pack, w_hh_T, dirs, out_dtype=dt_marker.dtype)

    h_prev = _shift_per_dir(hs, dirs)
    dw_hh = jnp.einsum(
        "tcbh,tcbg->chg", h_prev, dgates, preferred_element_type=jnp.float32
    )
    dx_projs = tuple(dgates[:, c] for c in range(C))
    return dx_projs, dw_hh


_dir_recurrence.defvjp(_dir_fwd, _dir_bwd)


def _use_dir_dma() -> bool:
    """Direction-aware per-chain DMA kernels — default OFF (measured loss).

    The design eliminates the caller-side flips and the pack interleave
    (~4 ms/step of glue in the round-3 leg-1 trace) by giving every chain
    its own HBM ref and time direction in the DMA index math — but the real
    chip measured it 8.7 ms/step SLOWER (847.6 vs 958.1 utt/s at B=64,
    results/round3/bench_leg2_*.json, repeated): 3C small per-chain DMA
    issues per step (4x 196 KB in + 8x 49 KB out) lose more to DMA issue
    overhead and semaphore serialization than the single-slab transfers
    saved in glue.  Kept opt-in (``PEX_LSTM_DIRDMA=1``) as the measured
    negative result so it is not retried blindly; the shipped path is the
    stacked-pack kernel fed by the (cheap, fusable) flip+stack."""
    import os

    flag = os.environ.get("PEX_LSTM_DIRDMA", "0")
    return flag not in ("0", "false", "off", "")


def multichain_lstm_dir(x_projs, w_hh, dirs):
    """C-chain fused recurrence over per-chain projection arrays.

    Args:
      x_projs: tuple of C (T, B, 4H) arrays, ALL in real time order.
      w_hh: (C, H, 4H) recurrent weights.
      dirs: tuple of C ints — 0 = forward chain, 1 = backward chain.

    Returns (T, C, B, H) hidden states in real time order (backward chains
    already un-flipped).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    dirs = tuple(dirs)

    def local(xs, w):
        padded = [_pad_batch(x) for x in xs]
        B = padded[0][1]
        hs = _dir_recurrence(dirs, tuple(p[0] for p in padded), w)
        return hs[:, :, :B]

    return _shard_over_batch(
        local,
        (tuple(x_projs), w_hh),
        in_specs=(tuple(P(None, DATA_AXIS, None) for _ in x_projs), P()),
        out_specs=P(None, None, DATA_AXIS, None),
        batch_size=x_projs[0].shape[1],
    )
