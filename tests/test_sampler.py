"""Euler sampler tests: scan-vs-python-loop equivalence, CFG batching."""

import jax
import jax.numpy as jnp
import numpy as np

from f_lite_tpu.models.dit import DiT, DiTConfig
from f_lite_tpu.ops.guidance import APGConfig, cfg_combine, guidance_combine
from f_lite_tpu.ops.timesteps import resolution_alpha, shift_t
from f_lite_tpu.sampling import DenoiseSettings, denoise, make_denoise_fn

CFG = DiTConfig(
    in_channels=16, patch_size=2, hidden_size=64, depth=2, num_heads=4,
    mlp_ratio=2.0, cross_attn_input_size=32, use_pallas_attention=False,
)


def _setup(seed=0):
    model = DiT(CFG)
    params = model.init_params(jax.random.key(seed), text_len=8, image_size=16)
    # perturb so the zero-init head produces non-zero velocities
    params = jax.tree.map(lambda p: p + 0.05, params)
    ks = jax.random.split(jax.random.key(seed + 1), 3)
    latents = jax.random.normal(ks[0], (2, 16, 16, 16))
    pos = jax.random.normal(ks[1], (2, 8, 32))
    neg = jnp.zeros_like(pos)
    mask = jnp.ones((2, 8), jnp.bool_)
    return model, params, latents, pos, neg, mask


def _python_loop_oracle(model, params, latents, pos, neg, mask, steps, g,
                        apg=None, interval=None):
    """Direct transcription of the reference loop (`pipeline.py:250-297`),
    plus per-step CFG gating for guidance_interval."""
    b = latents.shape[0]
    alpha = resolution_alpha(latents.shape[1] * latents.shape[2])
    z = latents.astype(jnp.float32)
    for i in range(steps, 0, -1):
        t = shift_t(i / steps, alpha)
        t_next = shift_t((i - 1) / steps, alpha)
        dt = t - t_next
        cfg_here = g >= 1.0 and (
            interval is None or interval[0] <= float(t) <= interval[1]
        )
        if cfg_here:
            z_in = jnp.concatenate([z, z], 0)
            ctx = jnp.concatenate([neg, pos], 0)
            m = jnp.concatenate([mask, mask], 0)
            t_in = jnp.full((2 * b,), t, jnp.float32)
            out = model.apply(params, z_in, ctx, m, t_in)
            v = guidance_combine(out[:b], out[b:], g, apg)
        else:
            t_in = jnp.full((b,), t, jnp.float32)
            v = model.apply(params, z, pos, mask, t_in)
        z = z + dt * v.astype(jnp.float32)
    return z


class TestDenoise:
    def test_scan_matches_python_loop(self):
        model, params, latents, pos, neg, mask = _setup()
        settings = DenoiseSettings(num_inference_steps=4, guidance_scale=6.0)
        got = denoise(model.apply, params, latents, pos, neg, mask, settings)
        want = _python_loop_oracle(model, params, latents, pos, neg, mask,
                                   4, 6.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_no_cfg_path(self):
        model, params, latents, pos, neg, mask = _setup(1)
        settings = DenoiseSettings(num_inference_steps=3, guidance_scale=0.0)
        got = denoise(model.apply, params, latents, pos, neg, mask, settings)
        want = _python_loop_oracle(model, params, latents, pos, neg, mask,
                                   3, 0.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_apg_path(self):
        model, params, latents, pos, neg, mask = _setup(2)
        apg = APGConfig(enabled=True, orthogonal_threshold=0.03)
        settings = DenoiseSettings(
            num_inference_steps=3, guidance_scale=6.0, apg=apg
        )
        got = denoise(model.apply, params, latents, pos, neg, mask, settings)
        want = _python_loop_oracle(model, params, latents, pos, neg, mask,
                                   3, 6.0, apg)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_chunked_matches_single_dispatch(self):
        model, params, latents, pos, neg, mask = _setup(5)
        settings = DenoiseSettings(num_inference_steps=5, guidance_scale=6.0)
        one = make_denoise_fn(model.apply, settings, donate=False)(
            params, latents, pos, neg, mask
        )
        for k in (1, 2, 5, 7):
            chunked = make_denoise_fn(
                model.apply, settings, donate=False, steps_per_dispatch=k
            )(params, latents, pos, neg, mask)
            np.testing.assert_allclose(
                np.asarray(chunked), np.asarray(one), atol=1e-5, rtol=1e-5,
                err_msg=f"steps_per_dispatch={k}",
            )

    def test_jitted_fn(self):
        model, params, latents, pos, neg, mask = _setup(3)
        settings = DenoiseSettings(num_inference_steps=2, guidance_scale=6.0)
        fn = make_denoise_fn(model.apply, settings, donate=False)
        got = fn(params, latents, pos, neg, mask)
        want = denoise(model.apply, params, latents, pos, neg, mask, settings)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_zero_velocity_is_identity(self):
        # with truly zero-init head, v == 0, so latents are unchanged
        model = DiT(CFG)
        params = model.init_params(jax.random.key(9), text_len=8,
                                   image_size=16)
        latents = jax.random.normal(jax.random.key(10), (1, 16, 16, 16))
        pos = jnp.zeros((1, 8, 32))
        settings = DenoiseSettings(num_inference_steps=3, guidance_scale=6.0)
        out = denoise(model.apply, params, latents, pos,
                      jnp.zeros_like(pos), None, settings)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(latents), atol=1e-6
        )


class TestNegativeMask:
    def test_asymmetric_neg_mask_changes_output(self):
        """A negative prompt longer than the positive keeps its own key
        mask through the CFG concat (round-1 dropped neg_mask entirely)."""
        model, params, latents, pos, _, mask = _setup(11)
        neg = jax.random.normal(jax.random.key(99), pos.shape)
        pos_mask = jnp.asarray([[True] * 4 + [False] * 4,
                                [True] * 8])
        neg_mask = jnp.ones((2, 8), jnp.bool_)  # negative uses all 8 tokens
        settings = DenoiseSettings(num_inference_steps=3, guidance_scale=6.0)
        fn = make_denoise_fn(model.apply, settings, donate=False)
        with_neg_mask = fn(params, latents, pos, neg, pos_mask,
                           neg_mask=neg_mask)
        without = fn(params, latents, pos, neg, pos_mask)
        diff = np.abs(
            np.asarray(with_neg_mask) - np.asarray(without)
        ).max()
        assert diff > 1e-6, "neg_mask was ignored"

    def test_neg_mask_oracle(self):
        """neg_mask path == python loop with [neg_mask, pos_mask] concat."""
        model, params, latents, pos, _, _ = _setup(12)
        neg = jax.random.normal(jax.random.key(98), pos.shape)
        pos_mask = jnp.asarray([[True] * 6 + [False] * 2, [True] * 8])
        neg_mask = jnp.asarray([[True] * 8, [True] * 3 + [False] * 5])
        settings = DenoiseSettings(num_inference_steps=3, guidance_scale=6.0)
        got = make_denoise_fn(model.apply, settings, donate=False)(
            params, latents, pos, neg, pos_mask, neg_mask=neg_mask
        )

        b = latents.shape[0]
        alpha = resolution_alpha(latents.shape[1] * latents.shape[2])
        z = latents.astype(jnp.float32)
        for i in range(3, 0, -1):
            t, t_next = shift_t(i / 3, alpha), shift_t((i - 1) / 3, alpha)
            z_in = jnp.concatenate([z, z], 0)
            ctx = jnp.concatenate([neg, pos], 0)
            m = jnp.concatenate([neg_mask, pos_mask], 0)
            t_in = jnp.full((2 * b,), t, jnp.float32)
            out = model.apply(params, z_in, ctx, m, t_in)
            v = guidance_combine(out[:b], out[b:], 6.0, None)
            z = z + (t - t_next) * v.astype(jnp.float32)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(z), atol=1e-5, rtol=1e-5
        )


class TestGuidanceInterval:
    def test_full_interval_equals_none(self):
        model, params, latents, pos, neg, mask = _setup(21)
        base = DenoiseSettings(num_inference_steps=4, guidance_scale=6.0)
        full = DenoiseSettings(num_inference_steps=4, guidance_scale=6.0,
                               guidance_interval=(0.0, 1.0))
        a = make_denoise_fn(model.apply, base, donate=False)(
            params, latents, pos, neg, mask
        )
        b = make_denoise_fn(model.apply, full, donate=False)(
            params, latents, pos, neg, mask
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_empty_interval_equals_no_cfg(self):
        model, params, latents, pos, neg, mask = _setup(22)
        never = DenoiseSettings(num_inference_steps=3, guidance_scale=6.0,
                                guidance_interval=(2.0, 3.0))
        nocfg = DenoiseSettings(num_inference_steps=3, guidance_scale=0.5)
        a = make_denoise_fn(model.apply, never, donate=False)(
            params, latents, pos, neg, mask
        )
        b = make_denoise_fn(model.apply, nocfg, donate=False)(
            params, latents, pos, neg, mask
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_mid_interval_matches_oracle_and_chunking(self):
        model, params, latents, pos, neg, mask = _setup(23)
        steps = 5
        alpha = resolution_alpha(latents.shape[1] * latents.shape[2])
        # CFG on the first 3 (highest-t) steps only: lo between t of step
        # indices 2 and 3 of the descending schedule
        t2 = float(shift_t(jnp.float32((steps - 2) / steps), alpha))
        t3 = float(shift_t(jnp.float32((steps - 3) / steps), alpha))
        interval = ((t2 + t3) / 2, 1.0)
        settings = DenoiseSettings(num_inference_steps=steps,
                                   guidance_scale=6.0,
                                   guidance_interval=interval)
        want = _python_loop_oracle(model, params, latents, pos, neg, mask,
                                   steps, 6.0, interval=interval)
        for k in (None, 2, 3):
            got = make_denoise_fn(model.apply, settings, donate=False,
                                  steps_per_dispatch=k)(
                params, latents, pos, neg, mask
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5,
                err_msg=f"steps_per_dispatch={k}",
            )
        # sanity: the gated run takes a different path than always-CFG
        # (toy-scale latents ~1e2 swamp allclose's rtol: compare exactly)
        always = _python_loop_oracle(model, params, latents, pos, neg,
                                     mask, steps, 6.0)
        assert not np.array_equal(np.asarray(want), np.asarray(always))


class TestCallback:
    def test_progress_and_completion(self):
        model, params, latents, pos, neg, mask = _setup(13)
        settings = DenoiseSettings(num_inference_steps=6, guidance_scale=6.0)
        fn = make_denoise_fn(model.apply, settings, donate=False,
                             steps_per_dispatch=2)
        seen = []
        fn(params, latents, pos, neg, mask,
           callback=lambda done, total: seen.append((done, total)) and False)
        assert seen == [(2, 6), (4, 6), (6, 6)]

    def test_single_dispatch_fires_once(self):
        model, params, latents, pos, neg, mask = _setup(13)
        settings = DenoiseSettings(num_inference_steps=4, guidance_scale=6.0)
        seen = []
        make_denoise_fn(model.apply, settings, donate=False)(
            params, latents, pos, neg, mask,
            callback=lambda done, total: seen.append((done, total)),
        )
        assert seen == [(4, 4)]

    def test_cancellation_stops_early(self):
        model, params, latents, pos, neg, mask = _setup(14)
        settings = DenoiseSettings(num_inference_steps=6, guidance_scale=6.0)
        fn = make_denoise_fn(model.apply, settings, donate=False,
                             steps_per_dispatch=2)
        # cancel after the first dispatch -> equals a 2-step partial run
        out = fn(params, latents, pos, neg, mask,
                 callback=lambda done, total: done >= 2)
        # oracle: run the same 6-step schedule but only its first 2 steps
        from f_lite_tpu.sampling.euler import (
            _denoise_schedule,
            _full_schedule,
        )

        schedule = _full_schedule(settings, 16, 16)
        want = _denoise_schedule(
            model.apply, params, latents, pos, neg, mask, None,
            schedule[:2], settings,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), atol=1e-5, rtol=1e-5
        )


class TestAutoStepsPerDispatch:
    def test_policy(self):
        from f_lite_tpu.sampling.euler import auto_steps_per_dispatch

        # batch-1 1024px (128x128 latents): whole trajectory, known good
        assert auto_steps_per_dispatch(1, 30, 128 * 128) is None
        # batch-4 1024px: the round-1 crash config -> chunked
        assert auto_steps_per_dispatch(4, 30, 128 * 128) == 8
        # batch-1 2048px: long dispatch -> chunked
        assert auto_steps_per_dispatch(1, 30, 256 * 256) == 8
        # tiny workloads: never chunk
        assert auto_steps_per_dispatch(4, 50, 16 * 16) is None


class TestMultistep:
    """AB2 (variable-step Adams-Bashforth 2) sampler: same model cost per
    step, second-order integration of the same flow ODE."""

    def _python_ab2_oracle(self, model, params, latents, pos, neg, mask,
                           steps, g):
        """Direct python-loop transcription of variable-step AB2 with
        midpoint extrapolation; first step Euler (no history)."""
        b = latents.shape[0]
        alpha = resolution_alpha(latents.shape[1] * latents.shape[2])
        z = latents.astype(jnp.float32)
        v_prev, h_prev = None, None
        for i in range(steps, 0, -1):
            t = shift_t(i / steps, alpha)
            t_next = shift_t((i - 1) / steps, alpha)
            dt = jnp.float32(t - t_next)
            z_in = jnp.concatenate([z, z], 0)
            ctx = jnp.concatenate([neg, pos], 0)
            m = jnp.concatenate([mask, mask], 0)
            t_in = jnp.full((2 * b,), t, jnp.float32)
            out = model.apply(params, z_in, ctx, m, t_in)
            v = guidance_combine(out[:b], out[b:], g, None).astype(
                jnp.float32)
            if v_prev is None:
                v_eff = v
            else:
                v_eff = v + (dt / (2.0 * h_prev)) * (v - v_prev)
            z = z + dt * v_eff
            v_prev, h_prev = v, dt
        return z

    def test_ab2_matches_python_oracle(self):
        model, params, latents, pos, neg, mask = _setup(11)
        settings = DenoiseSettings(num_inference_steps=4,
                                   guidance_scale=6.0, method="ab2")
        got = denoise(model.apply, params, latents, pos, neg, mask,
                      settings)
        want = self._python_ab2_oracle(model, params, latents, pos, neg,
                                       mask, 4, 6.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_one_step_ab2_equals_euler(self):
        model, params, latents, pos, neg, mask = _setup(12)
        kw = dict(num_inference_steps=1, guidance_scale=6.0)
        e = denoise(model.apply, params, latents, pos, neg, mask,
                    DenoiseSettings(**kw))
        a = denoise(model.apply, params, latents, pos, neg, mask,
                    DenoiseSettings(method="ab2", **kw))
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-6)

    def test_second_order_convergence(self):
        """On a smooth synthetic velocity field (a chaotic random-net
        field has no resolvable asymptotic regime at 8-16 steps), AB2
        must (a) beat Euler at equal steps and (b) show ~O(h^2) error
        decay where Euler shows ~O(h). Any callable works as dit_apply —
        denoise() only calls it."""

        def smooth_v(params, z, context, mask, t):
            tt = t.reshape((-1,) + (1,) * (z.ndim - 1))[: z.shape[0]]
            return (-z * (1.0 + 0.5 * jnp.sin(3.0 * tt))
                    + 0.3 * jnp.tanh(z) + 0.2 * jnp.cos(5.0 * tt))

        latents = jax.random.normal(jax.random.key(21), (2, 16, 16, 4))
        pos = jnp.zeros((2, 8, 32))
        neg = jnp.zeros_like(pos)
        mask = jnp.ones((2, 8), jnp.bool_)

        def run(method, steps):
            s = DenoiseSettings(num_inference_steps=steps,
                                guidance_scale=6.0, method=method)
            return np.asarray(
                denoise(smooth_v, None, latents, pos, neg, mask, s)
            ).astype(np.float64)

        truth = run("euler", 2048)
        err = {
            (m, n): np.sqrt(np.mean((run(m, n) - truth) ** 2))
            for m in ("euler", "ab2") for n in (8, 16)
        }
        # equal-step accuracy: ab2 at least 2x closer to the true solution
        assert err[("ab2", 16)] < 0.5 * err[("euler", 16)], err
        assert err[("ab2", 8)] < 0.5 * err[("euler", 8)], err
        # order: halving h cuts ab2 error ~4x (allow margin), euler ~2x
        ab2_ratio = err[("ab2", 8)] / err[("ab2", 16)]
        euler_ratio = err[("euler", 8)] / err[("euler", 16)]
        assert ab2_ratio > 2.8, (ab2_ratio, err)
        assert euler_ratio < 2.8, (euler_ratio, err)

    def test_chunked_matches_single_dispatch(self):
        """The velocity history must thread exactly across dispatch-chunk
        boundaries."""
        model, params, latents, pos, neg, mask = _setup(14)
        settings = DenoiseSettings(num_inference_steps=7,
                                   guidance_scale=6.0, method="ab2")
        one = make_denoise_fn(model.apply, settings, donate=False)(
            params, latents, pos, neg, mask
        )
        for k in (1, 3, 5):
            chunked = make_denoise_fn(
                model.apply, settings, donate=False, steps_per_dispatch=k
            )(params, latents, pos, neg, mask)
            np.testing.assert_allclose(
                np.asarray(chunked), np.asarray(one), atol=1e-5, rtol=1e-5,
                err_msg=f"steps_per_dispatch={k}",
            )

    def test_guidance_interval_resets_history(self):
        """With limited-interval guidance the cfg<->nocfg switch resets
        the AB2 history: chunked fn and segment-looped denoise() must
        agree (both reset at segment starts)."""
        model, params, latents, pos, neg, mask = _setup(15)
        settings = DenoiseSettings(
            num_inference_steps=6, guidance_scale=6.0, method="ab2",
            guidance_interval=(0.35, 0.85),
        )
        want = denoise(model.apply, params, latents, pos, neg, mask,
                       settings)
        for k in (None, 2):
            got = make_denoise_fn(
                model.apply, settings, donate=False, steps_per_dispatch=k
            )(params, latents, pos, neg, mask)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5,
                err_msg=f"steps_per_dispatch={k}",
            )

    def test_euler_program_unchanged(self):
        """method='euler' must produce the identical result it always
        has (the z-only scan carry is preserved)."""
        model, params, latents, pos, neg, mask = _setup(16)
        settings = DenoiseSettings(num_inference_steps=4,
                                   guidance_scale=6.0)
        got = denoise(model.apply, params, latents, pos, neg, mask,
                      settings)
        want = _python_loop_oracle(model, params, latents, pos, neg, mask,
                                   4, 6.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_bad_method_raises(self):
        import pytest

        with pytest.raises(ValueError, match="method"):
            DenoiseSettings(method="heun")

    def test_euler_scan_carry_is_z_only(self):
        """Pin the 'euler program unchanged' claim STRUCTURALLY (an
        output comparison would also pass for a recompiled-but-close
        program): the euler denoise scan carries exactly one array (z);
        ab2 carries three (z, v_prev, h_prev)."""
        from f_lite_tpu.sampling.euler import (
            _denoise_schedule,
            _full_schedule,
        )

        model, params, latents, pos, neg, mask = _setup(17)

        def carry_count(method):
            s = DenoiseSettings(num_inference_steps=3, guidance_scale=6.0,
                                method=method)
            schedule = _full_schedule(s, 16, 16)

            def f(z):
                out = _denoise_schedule(model.apply, params, z, pos, neg,
                                        mask, None, schedule, s)
                return out[0] if method == "ab2" else out

            jaxpr = jax.make_jaxpr(f)(latents)
            for eqn in jaxpr.eqns:
                if eqn.primitive.name == "scan":
                    return eqn.params["num_carry"]
            raise AssertionError("no scan equation found")

        assert carry_count("euler") == 1
        assert carry_count("ab2") == 3

    def test_ab2_inpaint_falls_back_to_euler(self):
        """Inpainting re-imposes fresh noise every step — an O(1) state
        discontinuity — so ab2 pins its history empty under a mask and
        must match euler+mask exactly."""
        model, params, latents, pos, neg, mask = _setup(18)
        x_lat = jax.random.normal(jax.random.key(31), latents.shape)
        m = (jax.random.uniform(jax.random.key(32),
                                latents.shape[:3] + (1,))
             > 0.5).astype(jnp.float32)

        def run(method):
            s = DenoiseSettings(num_inference_steps=4, guidance_scale=6.0,
                                method=method)
            fn = make_denoise_fn(model.apply, s, donate=False)
            return np.asarray(fn(
                params, latents, pos, neg, mask,
                inpaint=(x_lat, m, jax.random.key(33)),
            ))

        np.testing.assert_allclose(run("ab2"), run("euler"), atol=1e-6)
