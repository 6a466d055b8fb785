"""Pallas flash-attention kernel vs the XLA oracle (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f_lite_tpu.ops.attention import attention_xla
from f_lite_tpu.ops.pallas.flash_attention import flash_attention

fa = functools.partial(flash_attention, interpret=True)


def _qkv(b, h, lq, lk, d, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    q = jax.random.normal(ks[0], (b, h, lq, d), dtype)
    k = jax.random.normal(ks[1], (b, h, lk, d), dtype)
    v = jax.random.normal(ks[2], (b, h, lk, d), dtype)
    return q, k, v


class TestFlashForward:
    @pytest.mark.parametrize(
        "b,h,lq,lk,d",
        [
            (1, 2, 128, 128, 128),     # aligned, single block
            (2, 2, 256, 256, 128),     # aligned, 1 q block (block_q=256)
            (1, 2, 640, 640, 128),     # multiple k blocks
            (1, 1, 1040, 1040, 128),   # unaligned self-attn length (256² img)
            (2, 2, 130, 72, 128),      # unaligned both, cross-attn shaped
            (1, 2, 128, 128, 64),      # head_dim below lane width
        ],
    )
    def test_matches_xla_dense(self, b, h, lq, lk, d):
        q, k, v = _qkv(b, h, lq, lk, d)
        out = fa(q, k, v)
        ref = attention_xla(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_kv_mask_matches_xla(self):
        # prefix (right-padding) masks — the kernel's masking model
        b, h, lq, lk, d = 3, 2, 144, 96, 128
        q, k, v = _qkv(b, h, lq, lk, d, seed=1)
        lens = jnp.array([96, 41, 7])
        mask = jnp.arange(lk)[None, :] < lens[:, None]
        out = fa(q, k, v, kv_mask=mask)
        ref = attention_xla(q, k, v, kv_mask=mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )

    def test_kv_lens_equivalent_to_mask(self):
        b, h, lq, lk, d = 2, 1, 128, 130, 128
        q, k, v = _qkv(b, h, lq, lk, d, seed=7)
        lens = jnp.array([130, 65])
        out1 = fa(q, k, v, kv_lens=lens)
        mask = jnp.arange(lk)[None, :] < lens[:, None]
        out2 = fa(q, k, v, kv_mask=mask)
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))

    def test_masked_keys_have_no_influence(self):
        b, h, lq, lk, d = 1, 1, 128, 64, 128
        q, k, v = _qkv(b, h, lq, lk, d, seed=2)
        mask = jnp.ones((b, lk), jnp.bool_).at[:, 32:].set(False)
        out1 = fa(q, k, v, kv_mask=mask)
        k2 = k.at[:, :, 32:].set(1e3)
        v2 = v.at[:, :, 32:].set(-1e3)
        out2 = fa(q, k2, v2, kv_mask=mask)
        np.testing.assert_allclose(
            np.asarray(out1), np.asarray(out2), atol=1e-5
        )

    def test_bf16(self):
        q, k, v = _qkv(1, 2, 256, 256, 128, dtype=jnp.bfloat16, seed=3)
        out = fa(q, k, v)
        assert out.dtype == jnp.bfloat16
        ref = attention_xla(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32),
        )
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref), atol=0.06, rtol=0.05
        )

    def test_custom_scale(self):
        q, k, v = _qkv(1, 1, 128, 128, 128, seed=4)
        out = fa(q, k, v, scale=0.5)
        ref = attention_xla(q, k, v, scale=0.5)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )


class TestFlashBackward:
    def test_grads_self_attn_unaligned(self):
        # dense self-attention, unaligned length (multiple q and k blocks)
        b, h, l, d = 2, 2, 600, 64
        q, k, v = _qkv(b, h, l, l, d, seed=8)

        def loss_pallas(q, k, v):
            return jnp.sum(fa(q, k, v, block_q=256, block_k=256) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(attention_xla(q, k, v) ** 2)

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3
            )

    def test_grads_ragged_tail_split(self):
        # 1040 = 2*512 + 16: exercises the XLA ragged-tail split (the
        # serving shape 4112 = 8*512 + 16 takes the same path) through
        # both forward and backward, with a kv prefix mask
        b, h, l, d = 2, 2, 1040, 64
        q, k, v = _qkv(b, h, l, l, d, seed=12)
        lens = jnp.array([1040, 700], jnp.int32)
        mask = jnp.arange(l)[None, :] < lens[:, None]

        def loss_pallas(q, k, v):
            return jnp.sum(fa(q, k, v, kv_lens=lens,
                              block_q=512, block_k=256) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(attention_xla(q, k, v, kv_mask=mask) ** 2)

        out = fa(q, k, v, kv_lens=lens, block_q=512, block_k=256)
        ref = attention_xla(q, k, v, kv_mask=mask)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
        )
        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3
            )

    def test_grads_bwd_block_override(self):
        # bwd_block_q=1024 pads q to 2048 while the forward's lse was
        # padded at bq=512 (to 1536): exercises the lse row re-pad in
        # _flash_backward, with a kv prefix mask
        b, h, l, d = 1, 2, 1536, 64
        q, k, v = _qkv(b, h, l, l, d, seed=21)
        lens = jnp.array([1200], jnp.int32)
        mask = jnp.arange(l)[None, :] < lens[:, None]

        def loss_pallas(q, k, v):
            return jnp.sum(fa(q, k, v, kv_lens=lens, block_q=512,
                              block_k=256, bwd_block_q=1024,
                              bwd_block_k=512) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(attention_xla(q, k, v, kv_mask=mask) ** 2)

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3
            )

    def test_bwd_default_bq_selection(self, monkeypatch):
        """Default backward q block: padding-aware (bq=2048 only where it
        tiles cleanly), 128-aligned for wide heads, env-cappable, and
        bwd_block_q=0 means default (not a crash)."""
        from f_lite_tpu.ops.pallas.flash_attention import _bwd_default_bq

        # sweep shapes tile cleanly -> the measured-fastest 2048
        assert _bwd_default_bq(4096, 256) == 2048
        assert _bwd_default_bq(16384, 256) == 2048
        # lq=2560: 2048 would pad to 4096 (+60%); 512 pads zero
        assert _bwd_default_bq(2560, 256) == 512
        assert _bwd_default_bq(3072, 256) == 1024
        # wide heads: scaled-down budget stays 128-aligned and >= 512
        for d in (384, 512, 640, 768, 896):
            bq = _bwd_default_bq(4096, d)
            assert bq % 128 == 0 and bq >= 512, (d, bq)
        # scoped-vmem escape hatch
        monkeypatch.setenv("F_LITE_FLASH_MAX_BWD_BQ", "512")
        assert _bwd_default_bq(4096, 256) == 512

    def test_grads_bwd_block_zero_means_default(self):
        """bwd_block_q=0 selects the default (parity with bwd_block_k=0),
        instead of a ZeroDivisionError in the pad math."""
        b, h, l, d = 1, 2, 512, 64
        q, k, v = _qkv(b, h, l, l, d, seed=23)

        def loss(q, k, v):
            return jnp.sum(fa(q, k, v, block_q=256, block_k=256,
                              bwd_block_q=0, bwd_block_k=0) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(attention_xla(q, k, v) ** 2)

        g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3
            )

    def test_grads_bf16(self):
        b, h, l, d = 1, 2, 256, 128
        q, k, v = _qkv(b, h, l, l, d, dtype=jnp.bfloat16, seed=9)

        def loss_pallas(q, k, v):
            return jnp.sum(fa(q, k, v).astype(jnp.float32) ** 2)

        def loss_xla(q, k, v):
            qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
            return jnp.sum(attention_xla(qf, kf, vf) ** 2)

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32),
        )
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_),
                atol=0.15, rtol=0.1,
            )

    def test_grads_match_xla(self):
        b, h, lq, lk, d = 1, 2, 130, 70, 128
        q, k, v = _qkv(b, h, lq, lk, d, seed=5)
        mask = jnp.ones((b, lk), jnp.bool_).at[:, 50:].set(False)

        def loss_pallas(q, k, v):
            return jnp.sum(fa(q, k, v, kv_mask=mask) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(attention_xla(q, k, v, kv_mask=mask) ** 2)

        g1 = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), atol=5e-4, rtol=5e-4
            )


class TestCompactContext:
    """Mask-contract enforcement (round-1 weak #4): arbitrary masks are
    canonicalized to prefix form upstream; attention is permutation-
    invariant over keys so the result is exact."""

    def test_compact_makes_prefix(self):
        from f_lite_tpu.ops.attention import compact_context

        rs = np.random.RandomState(0)
        ctx = jnp.asarray(rs.randn(3, 8, 16).astype(np.float32))
        mask = jnp.asarray([
            [True, False, True, False, True, True, False, False],
            [False, False, False, True, True, False, False, True],
            [True] * 8,
        ])
        c2, m2 = compact_context(ctx, mask)
        m2 = np.asarray(m2)
        lens = m2.sum(-1)
        np.testing.assert_array_equal(lens, np.asarray(mask).sum(-1))
        for b in range(3):
            assert m2[b, : lens[b]].all() and not m2[b, lens[b]:].any()
        # real tokens preserved in stable order
        for b in range(3):
            np.testing.assert_array_equal(
                np.asarray(c2)[b, : lens[b]],
                np.asarray(ctx)[b][np.asarray(mask)[b]],
            )

    def test_prefix_mask_is_identity(self):
        from f_lite_tpu.ops.attention import compact_context

        ctx = jnp.arange(2 * 6 * 4, dtype=jnp.float32).reshape(2, 6, 4)
        mask = jnp.asarray([[True] * 4 + [False] * 2, [True] * 6])
        c2, m2 = compact_context(ctx, mask)
        np.testing.assert_array_equal(np.asarray(c2), np.asarray(ctx))
        np.testing.assert_array_equal(np.asarray(m2), np.asarray(mask))

    def test_pallas_with_compacted_mask_matches_xla_arbitrary(self):
        """compact_context + prefix kernel == XLA with the raw holey mask."""
        from f_lite_tpu.ops.attention import compact_context

        b, h, lq, lk, d = 2, 2, 64, 24, 128
        q, k_unused, v_unused = _qkv(b, h, lq, lk, d, seed=7)
        rs = np.random.RandomState(7)
        ctx = jnp.asarray(rs.randn(b, lk, h * d).astype(np.float32))
        mask = jnp.asarray(rs.rand(b, lk) > 0.4)

        def kv(c):
            m = c.reshape(b, lk, h, d).transpose(0, 2, 1, 3)
            return m, m * 0.5

        k_raw, v_raw = kv(ctx)
        want = attention_xla(q, k_raw, v_raw, kv_mask=mask)

        c2, m2 = compact_context(ctx, mask)
        k2, v2 = kv(c2)
        got = fa(q, k2, v2, kv_mask=m2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5
        )
