"""GaussianModel: masked Adam, structural edits, KNN scale init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_lang_splatting_tpu.models import gaussians as G
from online_lang_splatting_tpu.ops.knn import knn_mean_sq_dist


def _np_knn_mean_sq(points, k=3):
    d2 = ((points[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    return np.sort(d2, axis=1)[:, :k].mean(1)


class TestKNN:
    def test_matches_numpy(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        got = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), block=128))
        np.testing.assert_allclose(got, _np_knn_mean_sq(pts), rtol=1e-4, atol=1e-5)

    def test_with_invalid(self):
        rng = np.random.default_rng(1)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        valid = np.ones(100, bool)
        valid[50:] = False
        got = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), jnp.asarray(valid), block=64))
        expected = _np_knn_mean_sq(pts[:50])
        np.testing.assert_allclose(got[:50], expected, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got[50:], 0.0)


def _fresh(capacity=256, sh_degree=3, lang=15):
    params = G.empty_params(capacity, sh_degree, lang)
    aux = G.empty_aux(capacity)
    opt = G.init_adam(params)
    return params, aux, opt


def _extend_random(params, aux, opt, n, kf_id=0, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.normal(size=(n, 3)), dtype=jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=(n, 3)), dtype=jnp.float32)
    return G.extend_points(
        params, aux, opt, xyz=xyz, rgb=rgb,
        valid=jnp.ones((n,), bool), kf_id=kf_id,
    )


class TestStructure:
    def test_extend(self):
        params, aux, opt = _fresh()
        params, aux, opt, overflow = _extend_random(params, aux, opt, 100)
        assert not bool(overflow)
        assert int(aux.active.sum()) == 100
        assert (np.asarray(aux.kf_id[:100]) == 0).all()
        # Opacity init 0.5.
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(params.opacity[:100, 0])), 0.5, atol=1e-5
        )
        # Scales from 3-NN distances.
        xyz = np.asarray(params.xyz[:100])
        expected = np.log(np.sqrt(np.maximum(_np_knn_mean_sq(xyz), 1e-7)))
        np.testing.assert_allclose(
            np.asarray(params.scaling[:100, 0]), expected, rtol=1e-3, atol=1e-4
        )

    def test_extend_overflow(self):
        params, aux, opt = _fresh(capacity=64)
        params, aux, opt, overflow = _extend_random(params, aux, opt, 100)
        assert bool(overflow)
        assert int(aux.active.sum()) == 64

    def test_adam_only_updates_active(self):
        params, aux, opt = _fresh(capacity=32)
        params, aux, opt, _ = _extend_random(params, aux, opt, 16)
        lrs = G.LearningRates(*([jnp.float32(0.01)] * 7))
        grads = jax.tree.map(jnp.ones_like, params)
        before = np.asarray(params.xyz)
        new_params, opt = G.adam_step(params, grads, opt, lrs, aux.active)
        after = np.asarray(new_params.xyz)
        assert (np.abs(after[:16] - before[:16]) > 1e-5).all()
        np.testing.assert_array_equal(after[16:], before[16:])

    def test_adam_matches_torch(self):
        torch = pytest.importorskip("torch")
        params, aux, opt = _fresh(capacity=8)
        params, aux, opt, _ = _extend_random(params, aux, opt, 8)
        lrs = G.LearningRates(*([jnp.float32(0.02)] * 7))
        tp = torch.nn.Parameter(torch.from_numpy(np.asarray(params.xyz)).clone())
        topt = torch.optim.Adam([tp], lr=0.02, eps=1e-15)
        rng = np.random.default_rng(3)
        cur = params
        for i in range(5):
            g = rng.normal(size=(8, 3)).astype(np.float32)
            grads = jax.tree.map(jnp.zeros_like, cur)._replace(xyz=jnp.asarray(g))
            cur, opt = G.adam_step(cur, grads, opt, lrs, aux.active)
            tp.grad = torch.from_numpy(g)
            topt.step()
        np.testing.assert_allclose(
            np.asarray(cur.xyz), tp.detach().numpy(), rtol=1e-5, atol=1e-6
        )

    def test_reset_opacity(self):
        params, aux, opt = _fresh()
        params, aux, opt, _ = _extend_random(params, aux, opt, 10)
        opt = opt._replace(mu=opt.mu._replace(opacity=jnp.ones_like(opt.mu.opacity)))
        params, opt = G.reset_opacity(params, opt)
        np.testing.assert_allclose(
            np.asarray(jax.nn.sigmoid(params.opacity[:10, 0])), 0.01, atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(opt.mu.opacity), 0.0)

    def test_densify_clone_and_split(self):
        params, aux, opt = _fresh(capacity=128)
        params, aux, opt, _ = _extend_random(params, aux, opt, 20)
        n0 = int(aux.active.sum())
        # Force all to exceed grad threshold; small extent makes everything
        # a split candidate (max_scale > percent_dense * extent).
        aux = aux._replace(
            xyz_grad_accum=jnp.where(aux.active, 10.0, 0.0),
            denom=jnp.where(aux.active, 1.0, 0.0),
        )
        p2, a2, o2, ovf = G.densify_and_prune(
            params, aux, opt, jax.random.key(0),
            max_grad=1.0, min_opacity=0.005, extent=1e-6, max_screen_size=None,
            max_new=64,
        )
        assert not bool(ovf)
        # Every split original is replaced in place and gains one sibling.
        assert int(a2.active.sum()) == 2 * n0
        # Scales shrank by 1.6.
        np.testing.assert_allclose(
            np.asarray(jnp.exp(p2.scaling[:20])),
            np.asarray(jnp.exp(params.scaling[:20])) / 1.6, rtol=1e-5,
        )

        # Now a clone pass: huge extent makes everything a clone candidate.
        aux3 = a2._replace(
            xyz_grad_accum=jnp.where(a2.active, 10.0, 0.0),
            denom=jnp.where(a2.active, 1.0, 0.0),
        )
        p3, a3, o3, _ = G.densify_and_prune(
            p2, aux3, o2, jax.random.key(1),
            max_grad=1.0, min_opacity=0.005, extent=1e9, max_screen_size=None,
            max_new=64,
        )
        assert int(a3.active.sum()) == 2 * int(a2.active.sum())

    def test_prune_by_opacity(self):
        params, aux, opt = _fresh()
        params, aux, opt, _ = _extend_random(params, aux, opt, 30)
        low = jnp.arange(params.opacity.shape[0]) < 10
        params = params._replace(
            opacity=jnp.where(low[:, None], G.inverse_sigmoid(jnp.float32(0.001)),
                              params.opacity)
        )
        p2, a2, o2, _ = G.densify_and_prune(
            params, aux, opt, jax.random.key(0),
            max_grad=1e9, min_opacity=0.005, extent=1.0, max_screen_size=None,
        )
        assert int(a2.active.sum()) == 20
        assert not bool(a2.active[:10].any())

    def test_compact_roundtrip(self):
        params, aux, opt = _fresh(capacity=128)
        params, aux, opt, _ = _extend_random(params, aux, opt, 50)
        # Deactivate every other slot.
        kill = jnp.arange(128) % 2 == 0
        aux = G.prune_only(params, aux, kill)
        n_before = int(aux.active.sum())
        xyz_active = np.asarray(params.xyz)[np.asarray(aux.active)]
        p2, a2, o2, n = G.compact(params, aux, opt, 256)
        assert n == n_before
        assert p2.xyz.shape[0] == 256
        np.testing.assert_array_equal(np.asarray(p2.xyz[:n]), xyz_active)
        assert bool(a2.active[:n].all()) and not bool(a2.active[n:].any())

    def test_expon_lr(self):
        lr0 = float(G.expon_lr(0, 1e-3, 1e-5, max_steps=100))
        lr_mid = float(G.expon_lr(50, 1e-3, 1e-5, max_steps=100))
        lr_end = float(G.expon_lr(100, 1e-3, 1e-5, max_steps=100))
        assert lr0 == pytest.approx(1e-3, rel=1e-5)
        assert lr_mid == pytest.approx(1e-4, rel=1e-4)  # log-linear midpoint
        assert lr_end == pytest.approx(1e-5, rel=1e-5)
