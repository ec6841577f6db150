"""Flash-attention kernel numerics vs the plain einsum oracle.

VERDICT r2 #2: the fused-attention path must be numerically proven
(fp32 <=1e-5, bf16 <=1e-2) for forward AND gradients, with and without
masking, before it can carry the north-star benchmark.

Runs in Pallas interpret mode on CPU; the same code compiles via Mosaic
on TPU (exercised by bench.py's flash_attention entry).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from betty_tpu.ops.flash_attention import (
    flash_attention,
    reference_attention,
)


def _rand(shape, dtype, seed):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)


def _max_err(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                 - b.astype(jnp.float32))))


CASES = [
    # (B, H, S, D, dtype, tol_fwd, tol_bwd)
    (2, 3, 256, 64, jnp.float32, 1e-5, 1e-4),
    (2, 2, 256, 128, jnp.float32, 1e-5, 1e-4),
    (2, 2, 256, 64, jnp.bfloat16, 1e-2, 2e-2),
]


@pytest.mark.parametrize("B,H,S,D,dtype,tf,tb", CASES)
def test_forward_matches_reference(B, H, S, D, dtype, tf, tb):
    q = _rand((B, H, S, D), dtype, 0)
    k = _rand((B, H, S, D), dtype, 1)
    v = _rand((B, H, S, D), dtype, 2)
    out = flash_attention(q, k, v)
    ref = reference_attention(q, k, v)
    assert _max_err(out, ref) < tf


@pytest.mark.parametrize("B,H,S,D,dtype,tf,tb", CASES[:1])
def test_gradients_match_reference(B, H, S, D, dtype, tf, tb):
    q = _rand((B, H, S, D), dtype, 0)
    k = _rand((B, H, S, D), dtype, 1)
    v = _rand((B, H, S, D), dtype, 2)
    w = _rand((B, H, S, D), dtype, 3)  # fixed cotangent direction

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) * w)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v) * w)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        err = _max_err(a, b)
        # grads scale with S; normalize tolerance by grad magnitude
        scale = max(1.0, float(jnp.max(jnp.abs(b.astype(jnp.float32)))))
        assert err / scale < tb, f"d{name}: {err} (scale {scale})"


def test_kv_mask_forward_and_grads():
    B, H, S, D = 2, 2, 256, 64
    q = _rand((B, H, S, D), jnp.float32, 0)
    k = _rand((B, H, S, D), jnp.float32, 1)
    v = _rand((B, H, S, D), jnp.float32, 2)
    rng = np.random.RandomState(3)
    kv_mask = jnp.asarray(rng.rand(B, S) > 0.3)
    # ensure at least one valid key per batch
    kv_mask = kv_mask.at[:, 0].set(True)

    out = flash_attention(q, k, v, kv_mask)
    ref = reference_attention(q, k, v, kv_mask)
    assert _max_err(out, ref) < 1e-5

    w = _rand((B, H, S, D), jnp.float32, 4)
    gf = jax.grad(lambda *a: jnp.sum(flash_attention(*a, kv_mask) * w),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(reference_attention(*a, kv_mask) * w),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        assert _max_err(a, b) / scale < 1e-4, name


def test_causal_forward_and_grads():
    B, H, S, D = 1, 2, 256, 64
    q = _rand((B, H, S, D), jnp.float32, 0)
    k = _rand((B, H, S, D), jnp.float32, 1)
    v = _rand((B, H, S, D), jnp.float32, 2)

    out = flash_attention(q, k, v, causal=True)
    ref = reference_attention(q, k, v, causal=True)
    assert _max_err(out, ref) < 1e-5

    w = _rand((B, H, S, D), jnp.float32, 4)
    gf = jax.grad(lambda *a: jnp.sum(
        flash_attention(*a, causal=True) * w), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(
        reference_attention(*a, causal=True) * w), argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        scale = max(1.0, float(jnp.max(jnp.abs(b))))
        assert _max_err(a, b) / scale < 1e-4, name


def test_fully_masked_row_is_finite():
    """A batch row whose keys are ALL masked must produce zeros (the l==0
    guard), not NaN."""
    B, H, S, D = 2, 1, 128, 64
    q = _rand((B, H, S, D), jnp.float32, 0)
    k = _rand((B, H, S, D), jnp.float32, 1)
    v = _rand((B, H, S, D), jnp.float32, 2)
    kv_mask = jnp.ones((B, S), bool).at[1, :].set(False)
    out = flash_attention(q, k, v, kv_mask)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert float(jnp.max(jnp.abs(out[1]))) == 0.0


def test_rectangular_and_blocks():
    """kv_seq != q_seq and non-default block sizes."""
    B, H, Sq, Skv, D = 1, 2, 128, 384, 64
    q = _rand((B, H, Sq, D), jnp.float32, 0)
    k = _rand((B, H, Skv, D), jnp.float32, 1)
    v = _rand((B, H, Skv, D), jnp.float32, 2)
    out = flash_attention(q, k, v, block_q=64, block_kv=128)
    ref = reference_attention(q, k, v)
    assert _max_err(out, ref) < 1e-5


@pytest.mark.slow
def test_model_level_flash_parity():
    """TransformerClassifier(use_flash=True) == use_flash=False given the
    SAME weights (FlashSelfAttention mimics nn.MultiHeadDotProductAttention's
    parameter structure), at unpadded positions, eval mode."""
    from betty_tpu.models.transformer import TransformerClassifier

    plain = TransformerClassifier(vocab_size=50, max_len=128, dim=128,
                                  depth=2, heads=2, dropout=0.0)
    flash = TransformerClassifier(vocab_size=50, max_len=128, dim=128,
                                  depth=2, heads=2, dropout=0.0,
                                  use_flash=True)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, 50, (4, 128)).astype(np.int32))
    variables = plain.init(jax.random.PRNGKey(0), ids, train=False)
    out_p = plain.apply(variables, ids, train=False)
    out_f = flash.apply(variables, ids, train=False)
    assert _max_err(out_p, out_f) < 1e-4

    # gradient path too (sum-of-logits loss)
    gp = jax.grad(lambda v: jnp.sum(plain.apply(v, ids, train=False)))(
        variables)["params"]
    gf = jax.grad(lambda v: jnp.sum(flash.apply(v, ids, train=False)))(
        variables)["params"]
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(gp),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path(gf),
               key=lambda kv: str(kv[0])),
    ):
        assert str(ka) == str(kb)
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        assert _max_err(a, b) / scale < 1e-4, ka


def test_model_level_flash_parity_padded():
    """With padded inputs the two paths agree because padded QUERY rows are
    excluded by the masked mean pool (kv-side masking is exact)."""
    from betty_tpu.models.transformer import TransformerClassifier

    plain = TransformerClassifier(vocab_size=50, max_len=128, dim=128,
                                  depth=2, heads=2, dropout=0.0)
    flash = TransformerClassifier(vocab_size=50, max_len=128, dim=128,
                                  depth=2, heads=2, dropout=0.0,
                                  use_flash=True)
    rng = np.random.RandomState(0)
    ids = rng.randint(2, 50, (4, 128)).astype(np.int32)
    ids[:, 96:] = 1  # pad_id
    ids = jnp.asarray(ids)
    variables = plain.init(jax.random.PRNGKey(0), ids, train=False)
    out_p = plain.apply(variables, ids, train=False)
    out_f = flash.apply(variables, ids, train=False)
    assert _max_err(out_p, out_f) < 1e-4


def test_mosaic_block_shape_rule(monkeypatch):
    """Structural guard for the Mosaic TPU lowering rule that interpret
    mode does not enforce: every BlockSpec's last two block dims must be
    divisible by (8, 128) respectively OR equal the array's dims.

    Regression: the kv_mask used to ride as a (1, block_kv) block over a
    (B, Skv) array — legal in interpret mode, rejected by Mosaic for B > 1
    (sublane dim 1 is neither divisible by 8 nor equal to B). Spy on every
    pallas_call the kernels make (fwd, dK/dV, dQ) and check the rule
    against the actual operands, so CPU CI catches TPU-only lowering
    regressions."""
    import betty_tpu.ops.flash_attention as fa

    checked = []

    real_pallas_call = fa.pl.pallas_call

    def spy(kernel, *, grid, in_specs, out_specs, out_shape, **kw):
        inner = real_pallas_call(kernel, grid=grid, in_specs=in_specs,
                                 out_specs=out_specs, out_shape=out_shape,
                                 **kw)

        def wrapped(*args):
            specs = list(in_specs)
            outs = (list(out_specs) if isinstance(out_specs, (list, tuple))
                    else [out_specs])
            shapes = ([a.shape for a in args]
                      + [o.shape for o in (out_shape if isinstance(
                          out_shape, (list, tuple)) else [out_shape])])
            for spec, shape in zip(specs + outs, shapes):
                checked.append((tuple(spec.block_shape), tuple(shape)))
            return inner(*args)

        return wrapped

    monkeypatch.setattr(fa.pl, "pallas_call", spy)

    B, H, S, D = 8, 1, 256, 64
    q = _rand((B, H, S, D), jnp.float32, 0)
    k = _rand((B, H, S, D), jnp.float32, 1)
    v = _rand((B, H, S, D), jnp.float32, 2)
    rng = np.random.RandomState(3)
    kv_mask = jnp.asarray(rng.rand(B, S) > 0.3).at[:, 0].set(True)

    # exercise fwd + both bwd kernels, masked and causal+masked
    jax.grad(lambda *a: jnp.sum(fa.flash_attention(*a, kv_mask)),
             argnums=(0, 1, 2))(q, k, v)
    jax.grad(lambda *a: jnp.sum(
        fa.flash_attention(*a, kv_mask, causal=True)),
        argnums=(0, 1, 2))(q, k, v)

    assert len(checked) >= 18  # 3 calls x (>=5 operands + outputs) x 2
    for block, array in checked:

        def ok(bdim, adim, quantum):
            return bdim % quantum == 0 or bdim == adim

        assert ok(block[-1], array[-1], 128) and (
            len(block) < 2 or ok(block[-2], array[-2], 8)
        ), f"Mosaic-illegal block {block} over array {array}"


def test_selective_remat_policy_saves_flash_residuals():
    """TransformerClassifier(use_flash=True, remat=True) uses the
    save_only_these_names policy from flash_attention.remat_policy():
    the kernel's residuals (q/k/v/o/lse) survive the remat boundary —
    so the backward runs flash's own bwd kernels instead of replaying
    the pallas forward — while block activations (MLP/LN) rematerialize.

    Regression: blanket nn.remat replayed the flash forward AND the
    kernel recomputed scores internally (~3x attention compute; measured
    0.46x in-context at the north-star seq-512 shape)."""
    # public: jax.ad_checkpoint.print_saved_residuals; the list variant is
    # one module deeper (stable across jax 0.9)
    from jax._src.ad_checkpoint import saved_residuals

    from betty_tpu.models.transformer import TransformerClassifier
    from betty_tpu.ops.flash_attention import RESIDUAL_NAME

    model = TransformerClassifier(vocab_size=50, max_len=128, dim=128,
                                  depth=1, heads=4, dropout=0.0,
                                  use_flash=True, remat=True)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, 50, (2, 128)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), ids, train=False)

    res = saved_residuals(
        lambda v: jnp.sum(model.apply(v, ids, train=False)), variables)
    named = [str(a.shape) for a, desc in res if RESIDUAL_NAME in desc]
    # q, k, v, o at (B, H, S, D) + lse at (B, H, S, SAVE_LANES) + kv_mask
    assert any(s == "(2, 4, 128, 32)" for s in named), named
    assert any(s == "(2, 4, 128, 8)" for s in named), named  # slimmed lse
    # the MLP hidden (B, S, 4*dim) must NOT be saved (it rematerializes)
    all_shapes = [tuple(a.shape) for a, _ in res]
    assert (2, 128, 512) not in all_shapes, all_shapes

    # and gradients are bit-identical to the no-remat flash path
    plain = TransformerClassifier(vocab_size=50, max_len=128, dim=128,
                                  depth=1, heads=4, dropout=0.0,
                                  use_flash=True)
    pv = {"params": {
        k.replace("CheckpointEncoderBlock", "EncoderBlock"): v
        for k, v in variables["params"].items()
    }}
    g_r = jax.grad(lambda v: jnp.sum(model.apply(v, ids, train=False) ** 2))(
        variables)
    g_p = jax.grad(lambda v: jnp.sum(plain.apply(v, ids, train=False) ** 2))(
        pv)
    # align by path (the remat wrapper renames EncoderBlock_* ->
    # CheckpointEncoderBlock_*, which changes dict sort order)
    import flax

    fr = {
        k[0].replace("CheckpointEncoderBlock", "EncoderBlock"): v
        for k, v in flax.traverse_util.flatten_dict(
            g_r["params"], sep=None).items()
        for k in [("/".join(k),)]
    }
    fp = {("/".join(k),): v for k, v in flax.traverse_util.flatten_dict(
        g_p["params"], sep=None).items()}
    fp = {k[0]: v for k, v in fp.items()}
    assert set(fr) == set(fp)
    assert all(float(jnp.max(jnp.abs(fr[k] - fp[k]))) == 0.0 for k in fr)


def test_dots_remat_policy_saves_matmuls():
    """remat_policy="dots" (checkpoint_dots): matmul outputs survive the
    remat boundary — the backward replays only elementwise math — and
    gradients are bit-identical to blanket remat (policies change
    scheduling, never values)."""
    from jax._src.ad_checkpoint import saved_residuals

    from betty_tpu.models.transformer import TransformerClassifier

    kw = dict(vocab_size=50, max_len=64, dim=64, depth=1, heads=4,
              dropout=0.0, remat=True)
    dots = TransformerClassifier(**kw, remat_policy="dots")
    blanket = TransformerClassifier(**kw)
    rng = np.random.RandomState(0)
    ids = jnp.asarray(rng.randint(2, 50, (2, 64)).astype(np.int32))
    variables = dots.init(jax.random.PRNGKey(0), ids, train=False)

    res = saved_residuals(
        lambda v: jnp.sum(dots.apply(v, ids, train=False)), variables)
    shapes = [tuple(a.shape) for a, _ in res]
    # the MLP hidden matmul output (B, S, 4*dim) is saved under "dots"...
    assert (2, 64, 256) in shapes, shapes
    # ...and NOT under blanket remat (only block inputs survive there)
    res_b = saved_residuals(
        lambda v: jnp.sum(blanket.apply(v, ids, train=False)), variables)
    assert (2, 64, 256) not in [tuple(a.shape) for a, _ in res_b]

    loss = lambda m: lambda v: jnp.sum(  # noqa: E731
        m.apply(v, ids, train=False) ** 2)
    g_d = jax.grad(loss(dots))(variables)
    g_b = jax.grad(loss(blanket))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g_d),
                    jax.tree_util.tree_leaves(g_b)):
        assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_dots_remat_policy_invalid_name():
    from betty_tpu.models.transformer import TransformerClassifier

    model = TransformerClassifier(vocab_size=50, max_len=64, dim=64,
                                  depth=1, heads=4, remat=True,
                                  remat_policy="nope")
    ids = jnp.zeros((2, 64), jnp.int32)
    with pytest.raises(ValueError, match="remat_policy"):
        model.init(jax.random.PRNGKey(0), ids, train=False)


def test_single_tile_path_matches_multi_tile_path():
    """The r4 single-tile fast path (seq fits one block: head-blocked
    programs, merged dq/dk/dv backward with in-kernel di) must agree with
    the general online-softmax tiling on identical inputs — fwd and all
    three grads, with a kv padding mask and causal both exercised."""
    B, H, S, D = 2, 4, 128, 64
    q = _rand((B, H, S, D), jnp.float32, 0)
    k = _rand((B, H, S, D), jnp.float32, 1)
    v = _rand((B, H, S, D), jnp.float32, 2)
    w = _rand((B, H, S, D), jnp.float32, 3)
    kv_mask = jnp.asarray(
        np.random.RandomState(4).rand(B, S) > 0.2)

    for causal in (False, True):
        def loss(q, k, v, bq, bkv):
            o = flash_attention(q, k, v, kv_mask, causal=causal,
                                block_q=bq, block_kv=bkv)
            return jnp.sum(o * w)

        # bq=bkv=S -> single-tile path; 64/64 -> general tiling
        o_single = flash_attention(q, k, v, kv_mask, causal=causal)
        o_multi = flash_attention(q, k, v, kv_mask, causal=causal,
                                  block_q=64, block_kv=64)
        assert _max_err(o_single, o_multi) < 1e-5

        g_single = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, S, S)
        g_multi = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, 64, 64)
        for a, b, name in zip(g_single, g_multi, "qkv"):
            assert _max_err(a, b) < 1e-4, f"d{name} ({causal=})"


def test_single_tile_production_shape_bf16():
    """ADVICE r4: the production single-tile shape — S=512, bf16, H=16
    with real head-blocking — must agree with the multi-tile path and the
    einsum oracle, so a head-block or VMEM-budget regression at the
    north-star shape is caught in CI (the S=128/f32/H=4 case exercises
    block_h=H only)."""
    from betty_tpu.ops.flash_attention import _bwd_block_h, _fwd_block_h

    B, H, S, D = 1, 16, 512, 64
    q = _rand((B, H, S, D), jnp.bfloat16, 10)
    k = _rand((B, H, S, D), jnp.bfloat16, 11)
    v = _rand((B, H, S, D), jnp.bfloat16, 12)
    w = _rand((B, H, S, D), jnp.bfloat16, 13)
    kv_mask = jnp.asarray(np.random.RandomState(14).rand(B, S) > 0.15)

    # the shape must actually exercise head-blocking (bh < H), both ways
    assert _fwd_block_h(q, S) not in (None, H)
    assert _bwd_block_h(q, S) not in (None, H)

    def loss(q, k, v, bq, bkv):
        o = flash_attention(q, k, v, kv_mask, block_q=bq, block_kv=bkv)
        return jnp.sum(o.astype(jnp.float32) * w.astype(jnp.float32))

    o_single = flash_attention(q, k, v, kv_mask)
    o_multi = flash_attention(q, k, v, kv_mask, block_q=256, block_kv=256)
    o_ref = reference_attention(q, k, v, kv_mask)
    assert _max_err(o_single, o_multi) < 1e-2   # bf16 tolerance
    assert _max_err(o_single, o_ref) < 1e-2

    g_single = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, S, S)
    g_multi = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, 256, 256)
    for a, b, name in zip(g_single, g_multi, "qkv"):
        assert _max_err(a, b) < 2e-2, f"d{name}"


def test_single_tile_infeasible_falls_back_to_multi_tile():
    """ADVICE r4 (medium): when even a one-head block exceeds the VMEM
    budget (e.g. explicit block 1024 at S=1024 in the backward), the
    dispatch must take the general multi-tile path with clamped blocks
    instead of emitting a kernel whose single-head temporaries blow scoped
    VMEM."""
    from betty_tpu.ops.flash_attention import _bwd_block_h

    B, H, S, D = 1, 2, 1024, 64
    q = _rand((B, H, S, D), jnp.float32, 20)
    k = _rand((B, H, S, D), jnp.float32, 21)
    v = _rand((B, H, S, D), jnp.float32, 22)

    # backward at a single 1024 tile: 4 f32 score temporaries = 16 MiB
    # alone > the 12 MiB budget -> infeasible even at one head
    assert _bwd_block_h(q, S) is None

    def loss(q, k, v):
        o = flash_attention(q, k, v, block_q=1024, block_kv=1024)
        return jnp.sum(o)

    # must compile + run via the fallback, and agree with the oracle path
    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g, g_ref, "qkv"):
        assert _max_err(a, b) < 1e-4, f"d{name}"


def test_clamp_blocks_non_power_of_two_sequence():
    """r5 review: the multi-tile fallback used a hard 512 clamp, which
    crashes (`_blocks` divisibility check) for sequences not divisible by
    512 — e.g. S=896 at explicit block 896, where the forward fits the
    single tile but the backward does not. The clamp must fall to the
    largest divisor of S."""
    from betty_tpu.ops.flash_attention import _clamp_blocks

    assert _clamp_blocks(896, 896, 896, 896) == (448, 448)
    assert _clamp_blocks(1024, 1024, 1024, 1024) == (512, 512)
    assert _clamp_blocks(640, 640, 1024, 1024) == (320, 320)

    B, H, S, D = 1, 2, 896, 64
    q = _rand((B, H, S, D), jnp.float32, 30)
    k = _rand((B, H, S, D), jnp.float32, 31)
    v = _rand((B, H, S, D), jnp.float32, 32)

    def loss(q, k, v):
        o = flash_attention(q, k, v, block_q=896, block_kv=896)
        return jnp.sum(o)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    def loss_ref(q, k, v):
        return jnp.sum(reference_attention(q, k, v))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g, g_ref, "qkv"):
        assert _max_err(a, b) < 1e-4, f"d{name}"
