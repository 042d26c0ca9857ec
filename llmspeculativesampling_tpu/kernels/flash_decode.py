"""Pallas length-aware flash-decode attention (dense + int8 KV).

The static-shape KV cache (cache/kvcache.py) makes every XLA attention op
span ``[0, S_max)`` — correct (masked) but it *reads the whole cache from
HBM every layer, every step*. At serving shapes (S_max 1-4k, live length a
few hundred) that wastes most of the attention bandwidth. The reference
never hits this problem because it trims tensors on the host
(/root/reference/sampling/kvcache_model.py:359-436) — the TPU answer is a
kernel, not a realloc:

  * grid = (batch, kv_heads); the cache stays in HBM (``pltpu.ANY``) and
    the kernel manually DMAs ``block_t``-sized K/V chunks into VMEM,
    double-buffered, **only up to the live length** — dead cache positions
    are never fetched.
  * online (flash) softmax in fp32 accumulates across chunks; the new
    block (the S_new tokens being decoded, incl. tree candidates) comes in
    via VMEM with an additive ``block_bias`` (causal or tree mask,
    reference modeling_llama.py:684-689 semantics).
  * GQA: q rows are grouped per kv head ([G*S_new, D] tiles) so KV is
    never repeated (the reference materializes repeat_kv,
    modeling_llama.py:225-234).
  * int8 variant: K/V chunks are fetched as int8 + per-position scales and
    dequantized *algebraically* — scores = (q @ k_q^T) * k_s broadcast over
    columns, context = (p * v_s) @ v_q — so HBM only ever moves int8 and
    the bf16 cache never exists anywhere.

Exact-math parity with the XLA path (models/llama.py attention): same
masking semantics (prefix < length fully visible, block bias on the new
rows), fp32 softmax, fp32 accumulation.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_block_t(s_max: int) -> Optional[int]:
    for bt in (512, 256, 128):
        if s_max % bt == 0:
            return bt
    return None


def should_use(
    s_new: int, s_max: int, head_dim: int, mode: str = "auto",
    quant: bool = False,
) -> bool:
    """Trace-time gate: kernel for short new blocks (decode/verify/tree
    steps) over caches whose allocation divides a block size; XLA
    everywhere else (prefill, CPU tests, odd shapes). ``mode`` comes from
    the model config (``cfg.flash``); the LLMSS_FLASH env var overrides.

    head_dim: multiples of 128 run natively; sub-128 divisors of 128
    (64) run via the lane-folded path (dense and int8)."""
    del quant  # both paths support int8 KV
    flag = os.environ.get("LLMSS_FLASH") or {"on": "1", "off": "0"}.get(mode)
    if flag == "0":
        return False
    bt = _pick_block_t(s_max)
    dim_ok = head_dim % 128 == 0 or 128 % head_dim == 0
    ok = s_new <= 32 and bt is not None and dim_ok
    if flag == "1":  # forced (tests / cfg.flash="on")
        return ok
    # default: real TPU, and only when the cache is big enough to matter.
    # Folded head_dims below 64 (fold factor > 2) are toy-geometry-only
    # shapes that have produced Mosaic backend INTERNAL errors on real
    # chips (2026-08 v5e); every real draft/target is >= 64
    # (llama-68m / opt-125m: 64), so auto mode floors at 64.
    ok = ok and head_dim >= 64
    return ok and jax.default_backend() == "tpu" and s_max >= 2 * bt


# --------------------------------------------------------------------------
# kernel body (shared dense / int8; `quant` is a trace-time constant)
# --------------------------------------------------------------------------


def _make_kernel(
    block_t: int, quant: bool, head_dim: int, folded: bool, hg: int,
    paged: bool = False,
):
    def kernel(len_ref, *prefetch_and_args):
        if paged:
            # paged variant: second scalar-prefetch operand is the block
            # table [B, P]; chunk j of row b lives in pool block
            # bt_ref[b, j] instead of cache rows [j*bt, (j+1)*bt)
            bt_ref, q_ref, bias_ref, knew_ref, vnew_ref, kc_ref, vc_ref, *rest = (
                prefetch_and_args
            )
        else:
            bt_ref = None
            q_ref, bias_ref, knew_ref, vnew_ref, kc_ref, vc_ref, *rest = (
                prefetch_and_args
            )
        if quant:
            ks_ref, vs_ref, o_ref, k_scr, v_scr, ks_scr, vs_scr, sem = rest
        else:
            o_ref, k_scr, v_scr, sem = rest
            ks_ref = vs_ref = ks_scr = vs_scr = None

        b = pl.program_id(0)
        g = pl.program_id(1)  # kv-head *group*: heads [g*hg, (g+1)*hg)
        length = len_ref[b]
        r = q_ref.shape[2]

        # Folded (sub-128 head_dim) layout: K/V chunks arrive as
        # [bt/f, 128] with f = 128//D positions per row, position i*f+p in
        # lanes [p*D,(p+1)*D). Mosaic supports neither the unfolding
        # reshape nor strided lane slices, so all compute stays in the
        # folded space via selection-matrix dots:
        #   q_parts[p] = q @ Ep^T   places q in part-p lanes -> [r, 128]
        #   s_p  = q_parts[p] @ kb^T  scores of part-p positions [r, bt/f]
        #   A_p += p_p @ vb           folded context accumulators [r, 128]
        #   out  = sum_p A_p @ Ep     unfold once after the loop  [r, D]
        # (Ep = rows [p*D,(p+1)*D) of I_128; exact in any dtype.)
        f = 128 // head_dim if folded else 1
        if folded:
            rows = jax.lax.broadcasted_iota(jnp.int32, (head_dim, 128), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (head_dim, 128), 1)
            eps_t = [
                (cols == rows + p * head_dim).astype(jnp.float32)
                for p in range(f)
            ]  # Ep^T: [D, 128]

        # ---- new block, per head in the group (resident in VMEM; carries
        # the causal/tree bias). All-f32: the block is tiny and bf16 dots
        # with a 1-sized contraction/result dim lower to an invalid
        # mixed-type vector.broadcast in Mosaic (s_new=1 decode).
        ms, ls, accs, q_parts = [], [], [], []
        qp_dtype = jnp.bfloat16 if quant else k_scr.dtype
        for hi in range(hg):
            q = q_ref[0, hi]  # [R, D], softmax scale pre-folded
            kn = knew_ref[0, hi].astype(jnp.float32)  # [S_new, D]
            vn = vnew_ref[0, hi]
            s_new = jax.lax.dot_general(
                q.astype(jnp.float32), kn, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bias_ref[0]
            m = jnp.maximum(jnp.max(s_new, axis=-1, keepdims=True), _MASK)
            p = jnp.exp(s_new - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(
                p, vn.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ms.append(m)
            ls.append(l)
            if folded:
                # park the new-block context in part-0 lanes; the final
                # unfold A_0 @ E0 recovers it exactly (E0^T E0 = I_D)
                accs.append(
                    [
                        jax.lax.dot_general(
                            acc, eps_t[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    ]
                    + [jnp.zeros((r, 128), jnp.float32) for _ in range(f - 1)]
                )
                q_parts.append(
                    [
                        jax.lax.dot_general(
                            q.astype(jnp.float32), et, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(qp_dtype)
                        for et in eps_t
                    ]  # [r, 128] each: q in part-p lanes, zeros elsewhere
                )
            else:
                accs.append([acc])
                q_parts.append([q])

        # ---- prefix chunks: double-buffered DMA, fetched only up to
        # length, hg heads per copy (fewer, larger DMAs)
        nb = pl.cdiv(length, block_t)

        # chunk j covers positions [j*bt, (j+1)*bt); in the folded layout
        # those occupy rows [j*cr, (j+1)*cr) of the [S_max*D/128, 128] view
        cr = block_t * head_dim // 128 if folded else block_t

        def dmas(slot, j):
            if paged:
                bid = bt_ref[b, j]
                k_src = kc_ref.at[bid, pl.ds(g * hg, hg), :, :]
                v_src = vc_ref.at[bid, pl.ds(g * hg, hg), :, :]
            else:
                k_src = kc_ref.at[b, pl.ds(g * hg, hg), pl.ds(j * cr, cr), :]
                v_src = vc_ref.at[b, pl.ds(g * hg, hg), pl.ds(j * cr, cr), :]
            out = [
                pltpu.make_async_copy(k_src, k_scr.at[slot], sem.at[slot, 0]),
                pltpu.make_async_copy(v_src, v_scr.at[slot], sem.at[slot, 1]),
            ]
            if quant and folded:
                # scales arrive de-interleaved per part
                # ([B,Hkv,f,1,S_max/f] contiguous / [N,H,f,1,page/f] paged,
                # see _flash_call); part/head are major memref dims so the
                # slice keeps the proven (1, chunk)-shaped DMA pattern per
                # head
                cs = block_t // f
                for part in range(f):
                    if paged:
                        ks_src = ks_ref.at[bt_ref[b, j], pl.ds(g * hg, hg), part, :, :]
                        vs_src = vs_ref.at[bt_ref[b, j], pl.ds(g * hg, hg), part, :, :]
                    else:
                        ks_src = ks_ref.at[b, pl.ds(g * hg, hg), part, :, pl.ds(j * cs, cs)]
                        vs_src = vs_ref.at[b, pl.ds(g * hg, hg), part, :, pl.ds(j * cs, cs)]
                    out += [
                        pltpu.make_async_copy(
                            ks_src, ks_scr.at[slot, part], sem.at[slot, 2 + 2 * part],
                        ),
                        pltpu.make_async_copy(
                            vs_src, vs_scr.at[slot, part], sem.at[slot, 3 + 2 * part],
                        ),
                    ]
            elif quant:
                if paged:
                    ks_src = ks_ref.at[bt_ref[b, j], pl.ds(g * hg, hg), :, :]
                    vs_src = vs_ref.at[bt_ref[b, j], pl.ds(g * hg, hg), :, :]
                else:
                    ks_src = ks_ref.at[b, pl.ds(g * hg, hg), :, pl.ds(j * block_t, block_t)]
                    vs_src = vs_ref.at[b, pl.ds(g * hg, hg), :, pl.ds(j * block_t, block_t)]
                out += [
                    pltpu.make_async_copy(ks_src, ks_scr.at[slot], sem.at[slot, 2]),
                    pltpu.make_async_copy(vs_src, vs_scr.at[slot], sem.at[slot, 3]),
                ]
            return out

        @pl.when(nb > 0)
        def _():
            for d in dmas(0, 0):
                d.start()

        def chunk(j, carry):
            ms, ls, accs = carry
            ms, ls = list(ms), list(ls)
            accs = [list(a) for a in accs]
            slot = j % 2

            @pl.when(j + 1 < nb)
            def _():
                for d in dmas((j + 1) % 2, j + 1):
                    d.start()

            for d in dmas(slot, j):
                d.wait()

            for hi in range(hg):
                kb = k_scr[slot, hi]  # [bt, D] ([bt/f, 128] folded; int8 quant)
                vb = v_scr[slot, hi]
                cr_ = kb.shape[0]
                ss = []
                for part, qp in enumerate(q_parts[hi]):
                    if quant:
                        ksc = (
                            ks_scr[slot, part, hi] if folded
                            else ks_scr[slot, hi]
                        )
                        sp = jax.lax.dot_general(
                            qp.astype(jnp.bfloat16), kb.astype(jnp.bfloat16),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ) * ksc[0][None, :]  # k dequant deferred to columns
                    else:
                        sp = jax.lax.dot_general(
                            qp, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # [r, bt/f]: scores of positions i*f + part
                    colp = (
                        j * block_t + part
                        + f * jax.lax.broadcasted_iota(jnp.int32, (r, cr_), 1)
                    )
                    ss.append(jnp.where(colp < length, sp, _MASK))
                m_new = ms[hi]
                for sp in ss:
                    m_new = jnp.maximum(
                        m_new, jnp.max(sp, axis=-1, keepdims=True)
                    )
                corr = jnp.exp(ms[hi] - m_new)
                ps = [jnp.exp(sp - m_new) for sp in ss]
                ls[hi] = ls[hi] * corr + sum(
                    jnp.sum(p, axis=-1, keepdims=True) for p in ps
                )
                ms[hi] = m_new
                if quant:
                    vscs = [
                        (vs_scr[slot, part, hi] if folded
                         else vs_scr[slot, hi])
                        for part in range(f)
                    ]
                    ps = [
                        (p * vscs[part][0][None, :]).astype(jnp.bfloat16)
                        for part, p in enumerate(ps)
                    ]
                    vmul = vb.astype(jnp.bfloat16)
                else:
                    ps = [p.astype(vb.dtype) for p in ps]
                    vmul = vb
                accs[hi] = [
                    a * corr + jax.lax.dot_general(
                        p, vmul, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    for a, p in zip(accs[hi], ps)
                ]
            return tuple(ms), tuple(ls), tuple(tuple(a) for a in accs)

        carry0 = (tuple(ms), tuple(ls), tuple(tuple(a) for a in accs))
        ms, ls, accs = jax.lax.fori_loop(0, nb, chunk, carry0)

        for hi in range(hg):
            if folded:
                acc = sum(
                    jax.lax.dot_general(
                        a, et, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # A_p @ Ep (contract the 128 lanes) -> [r, D]
                    for a, et in zip(accs[hi], eps_t)
                )
            else:
                acc = accs[hi][0]
            o_ref[0, hi] = (acc / jnp.maximum(ls[hi], 1e-30)).astype(o_ref.dtype)

    return kernel


# --------------------------------------------------------------------------
# host-side wrappers
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _get_flash_fn(block_t: int, interpret: bool, quant: bool):
    """custom_vmap wrapper around the pallas_call: Mosaic cannot batch a
    scalar-prefetch grid under ``jax.vmap`` (the scheduler vmaps the spec
    step over serving slots, serve/scheduler.py), but the kernel is
    *natively* batched — grid=(batch, kv_heads) with per-row ``lengths``.
    The batching rule therefore collapses the vmapped axis into the
    kernel's batch axis: [S, B, ...] -> [S*B, ...], one kernel launch for
    all slots. Recursing through ``fn`` keeps deeper vmap nests collapsing
    too."""

    def impl(*args):
        lengths = args[6]
        scales = args[7:]
        return _flash_call(
            args[0], args[1], args[2], args[3], args[4], args[5], lengths,
            *(scales if scales else (None, None)),
            block_t=block_t, interpret=interpret, quant=quant,
        )

    fn = jax.custom_batching.custom_vmap(impl)

    @fn.def_vmap
    def _rule(axis_size, in_batched, *args):
        lifted = [
            a if b else jax.lax.broadcast(a, (axis_size,))
            for a, b in zip(args, in_batched)
        ]
        merged = [
            x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]) for x in lifted
        ]
        out = fn(*merged)
        out = out.reshape((axis_size, -1) + out.shape[1:])
        return out, True

    return fn


@functools.partial(jax.jit, static_argnames=("block_t", "interpret", "quant"))
def _flash_call(
    q_grouped,     # [B, Hkv, R, D] scale-folded
    bias_rows,     # [B, R, S_new] f32 additive (0 / -1e30)
    k_new, v_new,  # [B, Hkv, S_new, D] compute dtype
    k_cache, v_cache,    # [B, Hkv, S_max, D] (int8 when quant)
    lengths,       # [B] int32
    k_scales, v_scales,  # [B, Hkv, 1, S_max] f32, or None
    *, block_t: int, interpret: bool, quant: bool,
):
    bsz, hkv, r, d = q_grouped.shape
    s_new = k_new.shape[2]
    kv_dtype = k_cache.dtype
    s_max = k_cache.shape[2]

    # Sub-128 head_dim (e.g. llama-68m's 64): the tiled memref lane-pads
    # D -> 128, and a chunk DMA slice over the padded minor dim is rejected
    # by Mosaic ("slice shape along dimension 3 must be aligned to tiling").
    # Fold positions into lanes instead: view [S_max, D] as
    # [S_max*D/128, 128] (identical bytes, fully lane-aligned), DMA folded
    # chunks, and keep all kernel compute in the folded space (see
    # _make_kernel). Per-position int8 scales are de-interleaved host-side
    # into per-part rows so each part's chunk stays a contiguous lane slice.
    folded = d % 128 != 0
    f = 128 // d if folded else 1
    if folded:
        assert 128 % d == 0, d
        k_cache = k_cache.reshape(bsz, hkv, s_max * d // 128, 128)
        v_cache = v_cache.reshape(bsz, hkv, s_max * d // 128, 128)
        if quant:
            def deinterleave(sc):  # [B,Hkv,1,S_max] -> [B,Hkv,f,1,S_max/f]
                sc = sc.reshape(bsz, hkv, s_max // f, f)
                return sc.transpose(0, 1, 3, 2).reshape(bsz, hkv, f, 1, s_max // f)
            k_scales = deinterleave(k_scales)
            v_scales = deinterleave(v_scales)
    chunk_rows = block_t * d // 128 if folded else block_t
    chunk_lanes = 128 if folded else d

    # Heads per grid step: per-(slot, head) programs serialize into many
    # tiny DMAs (the TPU grid is sequential) and the fixed per-copy latency
    # swamps the bandwidth saving. Group as many kv heads per program as
    # keep one K or V chunk copy <= ~1 MiB (=> 2-slot double buffer of K+V
    # stays <= 4 MiB of the ~16 MiB VMEM), largest divisor of Hkv.
    unit = chunk_rows * chunk_lanes * kv_dtype.itemsize
    hg = 1
    for cand in range(hkv, 0, -1):
        if hkv % cand == 0 and cand * unit <= (1 << 20):
            hg = cand
            break

    in_specs = [
        pl.BlockSpec((1, hg, r, d), lambda b, g, L: (b, g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, r, s_new), lambda b, g, L: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, s_new, d), lambda b, g, L: (b, g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, s_new, d), lambda b, g, L: (b, g, 0, 0), memory_space=pltpu.VMEM),
        # HBM pinned (not ANY): with head_dim 64 the compiler may promote an
        # ANY-space cache into VMEM, where the lane-padded (64->128) tiling
        # makes the chunk DMA slice unaligned (Mosaic "slice shape along
        # dimension 3 must be aligned to tiling" error); in HBM the manual
        # double-buffered DMA is the whole point anyway.
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    args = [q_grouped, bias_rows, k_new, v_new, k_cache, v_cache]
    scratch = [
        pltpu.VMEM((2, hg, chunk_rows, chunk_lanes), kv_dtype),
        pltpu.VMEM((2, hg, chunk_rows, chunk_lanes), kv_dtype),
    ]
    n_sems = 2
    if quant:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ]
        args += [k_scales, v_scales]
        if folded:
            scratch += [
                pltpu.VMEM((2, f, hg, 1, block_t // f), jnp.float32),
                pltpu.VMEM((2, f, hg, 1, block_t // f), jnp.float32),
            ]
        else:
            scratch += [
                pltpu.VMEM((2, hg, 1, block_t), jnp.float32),
                pltpu.VMEM((2, hg, 1, block_t), jnp.float32),
            ]
        n_sems = 2 + 2 * f
    scratch.append(pltpu.SemaphoreType.DMA((2, n_sems)))

    return pl.pallas_call(
        _make_kernel(block_t, quant, d, folded, hg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bsz, hkv // hg),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, hg, r, d), lambda b, g, L: (b, g, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, r, d), q_grouped.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, *args)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret", "quant"))
def _paged_flash_call(
    q_grouped,     # [B, Hkv, R, D] scale-folded
    bias_rows,     # [B, R, S_new] f32 additive
    k_new, v_new,  # [B, Hkv, S_new, D] compute dtype
    k_pool, v_pool,      # [N_blocks, Hkv, page, D] (int8 when quant)
    lengths,       # [B] int32 per-row live positions
    tables,        # [B, P] int32 block tables
    k_scales, v_scales,  # [N_blocks, Hkv, page] f32, or None
    *, block_t: int, interpret: bool, quant: bool,
):
    """Paged variant of :func:`_flash_call`: chunk j of row b is DMA'd from
    pool block ``tables[b, j]`` (block_t == page). Pool stays in HBM; the
    block table rides the scalar-prefetch channel next to ``lengths``."""
    bsz, hkv, r, d = q_grouped.shape
    s_new = k_new.shape[2]
    kv_dtype = k_pool.dtype
    nblk, _, page, _ = k_pool.shape
    assert page == block_t

    folded = d % 128 != 0
    f = 128 // d if folded else 1
    if folded:
        assert 128 % d == 0, d
        k_pool = k_pool.reshape(nblk, hkv, page * d // 128, 128)
        v_pool = v_pool.reshape(nblk, hkv, page * d // 128, 128)
        if quant:
            def deinterleave(sc):  # [N,H,page] -> [N,H,f,1,page/f]
                sc = sc.reshape(nblk, hkv, page // f, f)
                return sc.transpose(0, 1, 3, 2).reshape(nblk, hkv, f, 1, page // f)
            k_scales = deinterleave(k_scales)
            v_scales = deinterleave(v_scales)
    elif quant:
        k_scales = k_scales.reshape(nblk, hkv, 1, page)
        v_scales = v_scales.reshape(nblk, hkv, 1, page)
    chunk_rows = block_t * d // 128 if folded else block_t
    chunk_lanes = 128 if folded else d

    unit = chunk_rows * chunk_lanes * kv_dtype.itemsize
    hg = 1
    for cand in range(hkv, 0, -1):
        if hkv % cand == 0 and cand * unit <= (1 << 20):
            hg = cand
            break

    in_specs = [
        pl.BlockSpec((1, hg, r, d), lambda b, g, L, T: (b, g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, r, s_new), lambda b, g, L, T: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, s_new, d), lambda b, g, L, T: (b, g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hg, s_new, d), lambda b, g, L, T: (b, g, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    args = [q_grouped, bias_rows, k_new, v_new, k_pool, v_pool]
    scratch = [
        pltpu.VMEM((2, hg, chunk_rows, chunk_lanes), kv_dtype),
        pltpu.VMEM((2, hg, chunk_rows, chunk_lanes), kv_dtype),
    ]
    n_sems = 2
    if quant:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ]
        args += [k_scales, v_scales]
        if folded:
            scratch += [
                pltpu.VMEM((2, f, hg, 1, block_t // f), jnp.float32),
                pltpu.VMEM((2, f, hg, 1, block_t // f), jnp.float32),
            ]
        else:
            scratch += [
                pltpu.VMEM((2, hg, 1, block_t), jnp.float32),
                pltpu.VMEM((2, hg, 1, block_t), jnp.float32),
            ]
        n_sems = 2 + 2 * f
    scratch.append(pltpu.SemaphoreType.DMA((2, n_sems)))

    return pl.pallas_call(
        _make_kernel(block_t, quant, d, folded, hg, paged=True),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(bsz, hkv // hg),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, hg, r, d), lambda b, g, L, T: (b, g, 0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, hkv, r, d), q_grouped.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, tables, *args)


def should_use_paged(
    s_new: int, page: int, head_dim: int, mode: str = "auto", quant: bool = False
) -> bool:
    """Trace-time gate for the paged kernel: decode/verify-sized new
    blocks over 128-multiple pages. Unlike the contiguous gate there is no
    minimum-cache-size condition — the XLA fallback *materializes* the
    gathered [B, P*page] view, so the kernel wins whenever it is legal."""
    flag = os.environ.get("LLMSS_FLASH") or {"on": "1", "off": "0"}.get(mode)
    if flag == "0":
        return False
    dim_ok = head_dim % 128 == 0 or 128 % head_dim == 0
    if quant and head_dim < 128 and dim_ok:
        # lane-folded int8 pools: the de-interleaved per-fold scale view is
        # [N, H, f, 1, page/f]; Mosaic HBM slices need the minor dim
        # 128-aligned, so page/f (f = 128/D) must be a lane multiple —
        # e.g. D=64 needs page >= 256 (page=128 fails to compile)
        if (page // (128 // head_dim)) % 128 != 0:
            return False
    ok = s_new <= 32 and page % 128 == 0 and page <= 512 and dim_ok
    if flag == "1":
        return ok
    # auto mode: native lanes only. The folded (head_dim < 128) paged
    # path wedges or INTERNAL-errors the Mosaic backend on real chips at
    # every tested fold (d=64 and d=32, 2026-08 v5e) despite passing in
    # isolation and in CPU interpret mode — XLA's gather fallback serves
    # sub-128 drafts instead. Forced mode (LLMSS_FLASH=1) keeps the folded
    # path for interpret-mode tests.
    return ok and head_dim % 128 == 0 and jax.default_backend() == "tpu"


def paged_flash_decode_attention(
    q: jax.Array,        # [B, Hq, S_new, D]
    k_new: jax.Array,    # [B, Hkv, S_new, D]
    v_new: jax.Array,
    k_pool: jax.Array,   # [N_blocks, Hkv, page, D]
    v_pool: jax.Array,
    block_tables: jax.Array,  # [B, P] int32
    lengths: jax.Array,       # [B] int32
    block_bias: jax.Array,    # [B, S_new, S_new] f32 additive
    *,
    scale: float,
    k_scales: Optional[jax.Array] = None,  # [N_blocks, Hkv, page] f32
    v_scales: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Paged flash-decode attention: prefix KV is fetched page-by-page from
    the shared pool (cache/paged.py) via the block table, double-buffered,
    only up to each row's live length; the new block attends from VMEM with
    the causal/tree ``block_bias``. Returns context [B, Hq, S_new, D]."""
    bsz, hq, s_new, d = q.shape
    hkv = k_pool.shape[1]
    g = hq // hkv
    page = k_pool.shape[2]
    quant = k_scales is not None
    if os.environ.get("LLMSS_FLASH_INTERPRET") == "1":
        interpret = True

    lengths = jnp.asarray(lengths, jnp.int32).reshape(-1)
    if k_new.shape[2] == 1:  # Mosaic 1-column new block workaround
        k_new = jnp.pad(k_new, ((0, 0), (0, 0), (0, 1), (0, 0)))
        v_new = jnp.pad(v_new, ((0, 0), (0, 0), (0, 1), (0, 0)))
        block_bias = jnp.pad(
            block_bias, ((0, 0), (0, 0), (0, 1)), constant_values=_MASK
        )

    qg = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qg = qg.reshape(bsz, hkv, g * s_new, d)
    r = g * s_new
    r_pad = max(8, _round_up(r, 8))
    if r_pad != r:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, r_pad - r), (0, 0)))
    bias_rows = jnp.tile(block_bias.astype(jnp.float32), (1, g, 1))
    if r_pad != r:
        bias_rows = jnp.pad(
            bias_rows, ((0, 0), (0, r_pad - r), (0, 0)), constant_values=_MASK
        )

    # sentinel/unused table entries are never reached (the kernel walks
    # only cdiv(length, page) chunks) but a clip keeps any out-of-contract
    # caller from DMA-ing outside the pool
    tables = jnp.minimum(
        jnp.asarray(block_tables, jnp.int32), k_pool.shape[0] - 1
    )
    out = _paged_flash_call(
        qg, bias_rows, k_new.astype(q.dtype), v_new.astype(q.dtype),
        k_pool, v_pool, lengths, tables,
        k_scales, v_scales, block_t=page, interpret=interpret, quant=quant,
    )
    out = out[:, :, :r].reshape(bsz, hkv, g, s_new, d).reshape(bsz, hq, s_new, d)
    return out


def flash_decode_attention(
    q: jax.Array,       # [B, Hq, S_new, D]
    k_new: jax.Array,   # [B, Hkv, S_new, D]
    v_new: jax.Array,
    k_cache: jax.Array,  # [B, Hkv, S_max, D] — prefix; positions >= length ignored
    v_cache: jax.Array,
    length: jax.Array,   # int32 scalar or [B]
    block_bias: jax.Array,  # [B, S_new, S_new] f32 additive (0 / -1e30)
    *,
    scale: float,
    k_scales: Optional[jax.Array] = None,  # [B, Hkv, S_max] f32 (int8 cache)
    v_scales: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Returns context [B, Hq, S_new, D] in q.dtype."""
    bsz, hq, s_new, d = q.shape
    hkv = k_cache.shape[1]
    g = hq // hkv
    s_max = k_cache.shape[2]
    block_t = _pick_block_t(s_max)
    assert block_t is not None, f"S_max={s_max} not divisible by 128"
    quant = k_scales is not None
    if os.environ.get("LLMSS_FLASH_INTERPRET") == "1":  # CPU test hook
        interpret = True

    lengths = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (bsz,))

    # Mosaic miscompiles a 1-column new block (single-token decode): pad the
    # kv side to 2 columns with a fully-masked dummy — softmax weight is
    # exactly 0, so the result is unchanged. q rows are not padded.
    if k_new.shape[2] == 1:
        k_new = jnp.pad(k_new, ((0, 0), (0, 0), (0, 1), (0, 0)))
        v_new = jnp.pad(v_new, ((0, 0), (0, 0), (0, 1), (0, 0)))
        block_bias = jnp.pad(
            block_bias, ((0, 0), (0, 0), (0, 1)), constant_values=_MASK
        )

    # group q rows per kv head and fold the softmax scale in
    qg = (q.astype(jnp.float32) * scale).astype(q.dtype)
    qg = qg.reshape(bsz, hkv, g * s_new, d)
    r = g * s_new
    r_pad = max(8, _round_up(r, 8))
    if r_pad != r:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, r_pad - r), (0, 0)))

    bias_rows = jnp.tile(block_bias.astype(jnp.float32), (1, g, 1))
    if r_pad != r:
        bias_rows = jnp.pad(
            bias_rows, ((0, 0), (0, r_pad - r), (0, 0)), constant_values=_MASK
        )

    args = [qg, bias_rows, k_new.astype(q.dtype), v_new.astype(q.dtype),
            k_cache, v_cache, lengths]
    if quant:
        args += [k_scales.reshape(bsz, hkv, 1, s_max),
                 v_scales.reshape(bsz, hkv, 1, s_max)]
    out = _get_flash_fn(block_t, interpret, quant)(*args)
    out = out[:, :, :r].reshape(bsz, hkv, g, s_new, d).reshape(bsz, hq, s_new, d)
    return out


def flash_decode_ref(
    q, k_new, v_new, k_cache, v_cache, length, block_bias, *,
    scale: float, k_scales=None, v_scales=None,
):
    """XLA reference with identical masking/accumulation semantics (used on
    CPU and in parity tests)."""
    bsz, hq, s_new, d = q.shape
    hkv = k_cache.shape[1]
    g = hq // hkv
    s_max = k_cache.shape[2]
    if k_scales is not None:
        k_cache = k_cache.astype(jnp.float32) * k_scales[..., None]
        v_cache = v_cache.astype(jnp.float32) * v_scales[..., None]
    kc = k_cache.astype(jnp.float32)
    vc = v_cache.astype(jnp.float32)
    qg = q.reshape(bsz, hkv, g, s_new, d).astype(jnp.float32) * scale

    s_pre = jnp.einsum("bhgsd,bhtd->bhgst", qg, kc)  # [B,Hkv,G,S_new,S_max]
    col = jnp.arange(s_max)
    lens = jnp.broadcast_to(jnp.asarray(length, jnp.int32).reshape(-1), (bsz,))
    s_pre = jnp.where(
        col[None, None, None, None, :] < lens.reshape(-1, 1, 1, 1, 1), s_pre, _MASK
    )
    s_blk = jnp.einsum("bhgsd,bhtd->bhgst", qg, k_new.astype(jnp.float32))
    s_blk = s_blk + block_bias[:, None, None].astype(jnp.float32)

    s_all = jnp.concatenate([s_pre, s_blk], axis=-1)
    p = jax.nn.softmax(s_all, axis=-1)
    v_all = jnp.concatenate([vc, v_new.astype(jnp.float32)], axis=2)
    ctx = jnp.einsum("bhgst,bhtd->bhgsd", p, v_all)
    return ctx.reshape(bsz, hq, s_new, d).astype(q.dtype)
