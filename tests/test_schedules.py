"""Golden-value tests for the diffusion schedule math (SURVEY.md §4
implication (a)): values are checked against independently-computed NumPy
references and the SD1.5 constants pinned by the reference YAML
(linear_start 0.00085, linear_end 0.012, T=1000)."""

import numpy as np
import jax.numpy as jnp

from magicdance_tpu.config import DiffusionConfig, Parameterization
from magicdance_tpu.ops import schedules as S


def test_linear_beta_schedule_endpoints():
    betas = S.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    # sqrt-space linearity
    sq = np.sqrt(betas)
    np.testing.assert_allclose(np.diff(sq), np.diff(sq)[0], rtol=1e-6)


def test_cosine_schedule_bounds():
    betas = S.make_beta_schedule("cosine", 100)
    assert (betas > 0).all() and (betas <= 0.999).all()


def test_schedule_derived_arrays():
    cfg = DiffusionConfig()
    sched = S.make_schedule(cfg)
    acp = np.cumprod(1.0 - np.asarray(S.make_beta_schedule("linear", 1000, 0.00085, 0.012)))
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - acp), rtol=1e-5
    )
    assert sched.alphas_cumprod_prev[0] == 1.0
    # SD1.5 known value: alphas_cumprod[-1] ≈ 0.0047 (fully noised)
    assert 0.003 < float(sched.alphas_cumprod[-1]) < 0.007


def test_q_sample_interpolates():
    cfg = DiffusionConfig()
    sched = S.make_schedule(cfg)
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0, 999])
    xt = S.q_sample(sched, x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(xt[0]).ravel()[0], float(sched.sqrt_alphas_cumprod[0]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(xt[1]).ravel()[0], float(sched.sqrt_alphas_cumprod[999]), rtol=1e-6
    )


def test_eps_x0_roundtrip():
    cfg = DiffusionConfig()
    sched = S.make_schedule(cfg)
    rngx = np.random.RandomState(0)
    x0 = jnp.asarray(rngx.randn(2, 8, 8, 4), dtype=jnp.float32)
    eps = jnp.asarray(rngx.randn(2, 8, 8, 4), dtype=jnp.float32)
    t = jnp.array([100, 700])
    xt = S.q_sample(sched, x0, t, eps)
    x0_rec = S.predict_start_from_noise(sched, xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_v_param_consistency():
    cfg = DiffusionConfig(parameterization=Parameterization.V)
    sched = S.make_schedule(cfg)
    rngx = np.random.RandomState(1)
    x0 = jnp.asarray(rngx.randn(2, 8, 8, 4), dtype=jnp.float32)
    eps = jnp.asarray(rngx.randn(2, 8, 8, 4), dtype=jnp.float32)
    t = jnp.array([50, 500])
    xt = S.q_sample(sched, x0, t, eps)
    v = S.get_v(sched, x0, eps, t)
    eps_rec = S.predict_eps_from_v(sched, xt, t, v)
    x0_rec = S.predict_start_from_z_and_v(sched, xt, t, v)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(eps), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_ddim_timestep_selection_matches_reference_semantics():
    cfg = DiffusionConfig()
    sched = S.make_schedule(cfg)
    ddim = S.make_ddim_schedule(sched, 50)
    ts = np.asarray(ddim.timesteps)
    # uniform: range(0, 1000, 20) + 1 (the +1 shift, util.py:56-58)
    np.testing.assert_array_equal(ts, np.arange(0, 1000, 20) + 1)
    np.testing.assert_allclose(
        np.asarray(ddim.alphas), np.asarray(sched.alphas_cumprod)[ts], rtol=1e-6
    )
    # alphas_prev = [acp[0]] + acp[ts[:-1]]
    np.testing.assert_allclose(
        np.asarray(ddim.alphas_prev)[1:], np.asarray(sched.alphas_cumprod)[ts[:-1]],
        rtol=1e-6,
    )
    np.testing.assert_allclose(ddim.alphas_prev[0], sched.alphas_cumprod[0], rtol=1e-6)
    # eta=0 → all sigmas 0
    assert float(np.abs(np.asarray(ddim.sigmas)).max()) == 0.0


def test_ddim_sigmas_eta1():
    cfg = DiffusionConfig()
    sched = S.make_schedule(cfg)
    ddim = S.make_ddim_schedule(sched, 20, eta=1.0)
    a = np.asarray(ddim.alphas)
    ap = np.asarray(ddim.alphas_prev)
    expect = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(np.asarray(ddim.sigmas), expect, rtol=1e-5)


def test_timestep_embedding_golden():
    emb = S.timestep_embedding(jnp.array([0.0, 1.0, 999.0]), 8)
    e = np.asarray(emb)
    assert e.shape == (3, 8)
    # t=0: cos half = 1, sin half = 0
    np.testing.assert_allclose(e[0], [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-6)
    # t=1: freqs = exp(-ln(10000) * [0..3]/4)
    freqs = np.exp(-np.log(10000.0) * np.arange(4) / 4)
    np.testing.assert_allclose(e[1], np.concatenate([np.cos(freqs), np.sin(freqs)]),
                               atol=1e-5)


def test_timestep_embedding_odd_dim():
    emb = S.timestep_embedding(jnp.array([3.0]), 7)
    assert emb.shape == (1, 7)
    assert float(emb[0, -1]) == 0.0
