"""Parallel layer tests on the virtual 8-device CPU mesh (reference:
tests/comm/ — multi-GPU tests spawned with NCCL; here shard_map over the
forced 8-device mesh, SURVEY.md §4 TPU translation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from flashinfer_tpu.ops.attention.reference import attention_reference
from flashinfer_tpu.ops.fused_moe import RoutingMethodType
from flashinfer_tpu.ops.norm import rmsnorm
from flashinfer_tpu.parallel import Mapping, make_mesh
from flashinfer_tpu.parallel.collectives import (
    MoeAlltoAll,
    all_reduce,
    allreduce_rmsnorm,
    moe_allreduce_fusion,
)
from flashinfer_tpu.parallel.ring_attention import (
    ring_attention,
    ulysses_attention,
)


def _mesh1d(name="cp", n=4):
    devs = np.asarray(jax.devices()[:n])
    return Mesh(devs, (name,))


# ---------------- Mapping ----------------


def test_mapping_rank_math():
    m = Mapping(world_size=16, rank=7, tp_size=2, pp_size=2, cp_size=2)
    assert m.dp_size == 2
    assert m.tp_rank == 1 and m.cp_rank == 1 and m.pp_rank == 1
    assert m.dp_rank == 0
    assert m.tp_group() == [6, 7]
    assert m.cp_group() == [5, 7]
    assert m.pp_group() == [3, 7]
    assert m.dp_group() == [7, 15]
    assert m.prev_pp_rank == 3 and m.next_pp_rank == 3
    assert not m.is_first_pp_rank and m.is_last_pp_rank


def test_mapping_moe_groups():
    m = Mapping(world_size=8, rank=3, tp_size=4, cp_size=2,
                moe_tp_size=2, moe_ep_size=4)
    # cp*tp grid of 8 ranks refactors into ep(4) x moe_tp(2)
    assert m.moe_tp_rank == (m.cp_rank * 4 + m.tp_rank) % 2
    assert m.moe_ep_rank == (m.cp_rank * 4 + m.tp_rank) // 2
    assert len(m.moe_ep_group()) == 4
    assert len(m.moe_tp_group()) == 2
    assert m.rank in m.moe_ep_group() and m.rank in m.moe_tp_group()


def test_mapping_validation():
    with pytest.raises(ValueError):
        Mapping(world_size=6, tp_size=4)
    with pytest.raises(ValueError):
        Mapping(world_size=8, tp_size=4, moe_tp_size=3, moe_ep_size=2)


def test_make_mesh_views():
    mapping = Mapping(world_size=8, tp_size=2, cp_size=2, dp_size=2,
                      moe_tp_size=1, moe_ep_size=4)
    ctx = make_mesh(mapping)
    assert ctx.mesh.shape == {"dp": 2, "pp": 1, "cp": 2, "tp": 2}
    assert ctx.moe_mesh.shape == {"dp": 2, "pp": 1, "ep": 4, "moe_tp": 1}


# ---------------- collectives ----------------


def test_allreduce_rmsnorm_fusion():
    mesh = _mesh1d("tp", 4)
    rng = np.random.default_rng(0)
    # per-device partial activations
    x = jnp.asarray(rng.standard_normal((4, 8, 32)), jnp.float32)
    residual = jnp.asarray(rng.standard_normal((8, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal(32), jnp.float32)

    def body(x_local, residual, w):
        return allreduce_rmsnorm(x_local[0], residual, w, axis_name="tp")

    normed, new_res = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("tp"), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(x, residual, w)
    want_res = np.asarray(x).sum(0) + np.asarray(residual)
    np.testing.assert_allclose(np.asarray(new_res), want_res, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(normed),
        np.asarray(rmsnorm(jnp.asarray(want_res), w)),
        rtol=1e-5, atol=1e-5,
    )


def test_moe_allreduce_fusion():
    mesh = _mesh1d("tp", 2)
    rng = np.random.default_rng(1)
    moe = jnp.asarray(rng.standard_normal((2, 4, 16)), jnp.float32)
    shared = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    w = jnp.ones(16, jnp.float32)

    def body(moe_local, shared, res, w):
        return moe_allreduce_fusion(
            moe_local[0], jnp.float32(0.5), shared, res, w, axis_name="tp"
        )

    normed, new_res = jax.shard_map(
        body, mesh=mesh, in_specs=(P("tp"), P(), P(), P()),
        out_specs=(P(), P()), check_vma=False,
    )(moe, shared, res, w)
    want = 0.5 * np.asarray(moe).sum(0) + np.asarray(shared) + np.asarray(res)
    np.testing.assert_allclose(np.asarray(new_res), want, rtol=1e-5, atol=1e-5)


# ---------------- ring / ulysses CP ----------------


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_dense(causal):
    mesh = _mesh1d("cp", 4)
    rng = np.random.default_rng(2)
    seq, h, d = 32, 2, 16
    q = jnp.asarray(rng.standard_normal((seq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((seq, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((seq, h, d)), jnp.float32)
    out, lse = ring_attention(q, k, v, mesh, causal=causal, return_lse=True)
    ref, ref_lse = attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(ref_lse),
                               rtol=2e-4, atol=2e-4)


def test_ulysses_attention_matches_dense():
    mesh = _mesh1d("cp", 2)
    rng = np.random.default_rng(3)
    seq, h, d = 16, 4, 8
    q = jnp.asarray(rng.standard_normal((seq, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((seq, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((seq, h, d)), jnp.float32)
    out = ulysses_attention(q, k, v, mesh, causal=True)
    ref, _ = attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


# ---------------- MoE alltoall ----------------


def test_moe_alltoall_roundtrip():
    mesh = _mesh1d("ep", 4)
    rng = np.random.default_rng(4)
    num_experts, top_k, hidden = 8, 2, 16
    local_tokens = 4
    # global token array: [ep * local_tokens, hidden]
    x = jnp.asarray(rng.standard_normal((16, hidden)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, num_experts, (16, top_k)), jnp.int32)
    scales = jnp.asarray(rng.uniform(0.2, 1.0, (16, top_k)), jnp.float32)
    a2a = MoeAlltoAll(num_experts, capacity=16, axis_name="ep")

    def body(x, ids, scales):
        recv_x, recv_e, slot = a2a.dispatch(x, ids)
        # "expert computation" = scale by (expert id + 1)
        y = recv_x * jnp.where(recv_e >= 0, recv_e + 1, 0)[:, None]
        return a2a.combine(y, slot, ids, scales)

    out = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P("ep"), P("ep"), P("ep")),
        out_specs=P("ep"),
        check_vma=False,
    )(x, ids, scales)
    want = np.zeros((16, hidden), np.float32)
    for t in range(16):
        for j in range(top_k):
            want[t] += float(scales[t, j]) * (int(ids[t, j]) + 1) * np.asarray(
                x[t]
            )
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_gemm_allreduce():
    import jax
    from jax.sharding import Mesh, PartitionSpec as P

    from flashinfer_tpu.parallel.collectives import gemm_allreduce

    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    want = np.asarray(x @ w, np.float32)

    f = jax.shard_map(
        lambda xs, ws: gemm_allreduce(xs, ws, "tp"),
        mesh=mesh,
        in_specs=(P(None, "tp"), P("tp", None)),
        out_specs=P(),
        check_vma=False,
    )
    got = np.asarray(f(x, w))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ---------------- EP-sharded MoE layer ----------------


@pytest.mark.parametrize("routing", [RoutingMethodType.Default,
                                     RoutingMethodType.Renormalize])
def test_fused_moe_ep_matches_single_device(routing):
    """fused_moe_ep (route -> alltoall dispatch -> local grouped GEMMs ->
    combine) equals the single-device fused_moe when capacity is ample."""
    from flashinfer_tpu.parallel import fused_moe_ep
    from flashinfer_tpu.ops.fused_moe import fused_moe, route_tokens

    mesh = _mesh1d("ep", 4)
    rng = np.random.default_rng(11)
    tokens, hidden, inter, e, top_k = 32, 64, 32, 8, 2
    x = jnp.asarray(rng.standard_normal((tokens, hidden)) * 0.3, jnp.float32)
    logits = jnp.asarray(rng.standard_normal((tokens, e)), jnp.float32)
    w13 = jnp.asarray(rng.standard_normal((e, 2 * inter, hidden)) * 0.1,
                      jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, hidden, inter)) * 0.1,
                     jnp.float32)

    out = fused_moe_ep(x, logits, w13, w2, mesh, top_k=top_k,
                       routing_method=routing, capacity=tokens * top_k)
    ids, scales = route_tokens(logits, top_k, routing)
    ref = fused_moe(x, w13, w2, ids, scales)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("fp8", [False, True])
def test_fused_moe_tp_matches_single_device(fp8):
    """fused_moe_tp (all experts on every device, intermediate dim sharded
    over moe_tp, one psum on the down-projection partials — reference
    Mapping moe_tp factorization, comm/mapping.py:127-148) equals the
    single-device fused_moe. No capacity/drop semantics: TP MoE is exact."""
    from flashinfer_tpu.parallel import fused_moe_tp
    from flashinfer_tpu.ops.fused_moe import fused_moe, route_tokens

    mesh = _mesh1d("moe_tp", 4)
    rng = np.random.default_rng(13)
    tokens, hidden, inter, e, top_k = 24, 64, 32, 4, 2
    x = jnp.asarray(rng.standard_normal((tokens, hidden)) * 0.3, jnp.bfloat16)
    logits = jnp.asarray(rng.standard_normal((tokens, e)), jnp.float32)
    w13 = jnp.asarray(rng.standard_normal((e, 2 * inter, hidden)) * 0.1,
                      jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((e, hidden, inter)) * 0.1,
                     jnp.bfloat16)
    s13 = s2 = None
    if fp8:
        def q(w):
            return jax.lax.bitcast_convert_type(
                (w.astype(jnp.float32) / 0.1).astype(jnp.float8_e4m3fn),
                jnp.int8)

        w13, w2 = q(w13), q(w2)
        s13 = jnp.full((e,), 0.1, jnp.float32)
        s2 = jnp.full((e,), 0.1, jnp.float32)

    out = fused_moe_tp(x, logits, w13, w2, mesh, top_k=top_k,
                       w13_scale=s13, w2_scale=s2)
    ids, scales = route_tokens(logits, top_k)
    ref = fused_moe(x, w13, w2, ids, scales, w13_scale=s13, w2_scale=s2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_fused_moe_ep_capacity_drop():
    """Overflowing token-copies drop out of the combine (contribute zero),
    never corrupt other tokens."""
    from flashinfer_tpu.parallel import fused_moe_ep

    mesh = _mesh1d("ep", 4)
    rng = np.random.default_rng(12)
    tokens, hidden, inter, e = 16, 32, 16, 4
    x = jnp.asarray(rng.standard_normal((tokens, hidden)) * 0.3, jnp.float32)
    # all tokens pick expert 0 -> device 0 floods; capacity 2 keeps 2/rank
    logits = jnp.zeros((tokens, e)).at[:, 0].set(10.0)
    w13 = jnp.asarray(rng.standard_normal((e, 2 * inter, hidden)) * 0.1,
                      jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, hidden, inter)) * 0.1,
                     jnp.float32)
    out = fused_moe_ep(x, logits, w13, w2, mesh, top_k=1, capacity=2)
    out = np.asarray(out)
    # per ep-rank of 4 tokens, the first 2 got through, the rest dropped
    kept = np.abs(out).sum(axis=1) > 0
    assert kept.reshape(4, 4)[:, :2].all() and not kept.reshape(4, 4)[:, 2:].any()


# ---------------- pipeline parallelism ----------------


def test_pipeline_forward_matches_sequential():
    """ppermute microbatch pipeline == sequentially composed stages
    (the mechanism the reference's pp rank math implies but never ships)."""
    from flashinfer_tpu.parallel import pipeline_forward

    pp, num_micro, mb, d = 4, 6, 2, 16
    mesh = _mesh1d("pp", pp)
    rng = np.random.default_rng(7)
    Ws = jnp.asarray(rng.standard_normal((pp, d, d)) * 0.3, jnp.float32)
    bs = jnp.asarray(rng.standard_normal((pp, d)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((num_micro, mb, d)), jnp.float32)

    def stage(params, a):
        W, b = params
        return jnp.tanh(a @ W + b)

    out = pipeline_forward(stage, (Ws, bs), x, mesh)

    ref = x
    for s in range(pp):
        ref = jnp.tanh(ref @ Ws[s] + bs[s])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_llama_forward_pipelined_matches_dense():
    """REAL pp-sharded model forward: 4-stage Llama trunk pipeline (stage s
    holds layers s*L/pp..; embedding + lm_head outside the ring) equals the
    dense single-device forward. The pipeline output is pp-SHARDED (no psum
    broadcast; consumers read the last stage's shard only)."""
    from flashinfer_tpu.models.llama import (
        LlamaConfig,
        llama_forward_dense,
        llama_init_weights,
    )
    from flashinfer_tpu.parallel import llama_forward_pipelined

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=4,
        num_qo_heads=4, num_kv_heads=2, head_dim=16, dtype=jnp.float32,
    )
    params = llama_init_weights(jax.random.key(0), cfg)
    mesh = _mesh1d("pp", 4)
    rng = np.random.default_rng(17)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 6)), jnp.int32)

    want = llama_forward_dense(params, tokens, cfg)
    got = llama_forward_pipelined(
        params, tokens, cfg, mesh, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("fp8", [False, True])
def test_fused_moe_ep_x_moe_tp(fp8):
    """Combined moe_tp x ep factorization (reference comm/mapping.py:127-148
    moe_tp*moe_ep == moe_cluster-free world size): experts sharded over ep,
    their intermediate dim further sharded over moe_tp, one psum on the
    down-proj partials before the ep combine. Per-expert fp8 dequant scales
    shard over ep with the experts."""
    from flashinfer_tpu.parallel import fused_moe_ep
    from flashinfer_tpu.ops.fused_moe import fused_moe, route_tokens
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("ep", "moe_tp"))
    rng = np.random.default_rng(23)
    tokens, hidden, inter, e, top_k = 16, 64, 32, 8, 2
    x = jnp.asarray(rng.standard_normal((tokens, hidden)) * 0.3, jnp.float32)
    logits = jnp.asarray(rng.standard_normal((tokens, e)), jnp.float32)
    w13 = jnp.asarray(rng.standard_normal((e, 2 * inter, hidden)) * 0.1,
                      jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, hidden, inter)) * 0.1,
                     jnp.float32)
    s13 = s2 = None
    if fp8:
        # per-expert scales exercise the ep scale sharding
        s13 = jnp.asarray(rng.uniform(0.05, 0.15, e), jnp.float32)
        s2 = jnp.asarray(rng.uniform(0.05, 0.15, e), jnp.float32)

        def q(w, s):
            return jax.lax.bitcast_convert_type(
                (w / s[:, None, None]).astype(jnp.float8_e4m3fn), jnp.int8)

        w13q, w2q = q(w13, s13), q(w2, s2)
    else:
        w13q, w2q = w13, w2

    out = fused_moe_ep(x, logits, w13q, w2q, mesh, top_k=top_k,
                       capacity=tokens * top_k, tp_axis_name="moe_tp",
                       w13_scale=s13, w2_scale=s2)
    ids, scales = route_tokens(logits, top_k)
    ref = fused_moe(x, w13q, w2q, ids, scales, w13_scale=s13, w2_scale=s2)
    tol = 2e-2 if fp8 else 2e-4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=tol, atol=tol)
