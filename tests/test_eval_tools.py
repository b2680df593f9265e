"""TSDF fusion, EMD, Chamfer, relevancy scoring, PLY IO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_lang_splatting_tpu.ops.chamfer import chamfer_distance, nn_dist
from online_lang_splatting_tpu.ops.emd import approx_match, earth_mover_distance
from online_lang_splatting_tpu.tsdf.fusion import TSDFVolume, estimate_bounds


class TestTSDF:
    def _setup_plane(self):
        # Camera at origin looking +z; flat wall at z=2 with 2-channel features.
        h, w = 32, 40
        fx = fy = 40.0
        cx, cy = w / 2, h / 2
        depth = np.full((h, w), 2.0, np.float32)
        feat = np.zeros((2, h, w), np.float32)
        feat[0] = 0.7
        feat[1, :, : w // 2] = 1.0
        return (fx, fy, cx, cy), depth, feat

    def test_integrate_plane(self):
        intr, depth, feat = self._setup_plane()
        vol = TSDFVolume([[-2, 2], [-2, 2], [0.5, 3.0]], 0.05, n_channels=2)
        vol.integrate(feat, depth, intr, np.eye(4, dtype=np.float32))
        pts, feats = vol.get_point_cloud(tsdf_thresh=0.3)
        assert len(pts) > 50
        # Surface points concentrate near z=2.
        assert abs(np.median(pts[:, 2]) - 2.0) < 0.15
        assert abs(np.median(feats[:, 0]) - 0.7) < 0.05

    def test_multi_view_weighting(self):
        intr, depth, feat = self._setup_plane()
        vol = TSDFVolume([[-2, 2], [-2, 2], [0.5, 3.0]], 0.1, n_channels=2)
        # Two integrations with different feature values average.
        vol.integrate(feat, depth, intr, np.eye(4, dtype=np.float32))
        vol.integrate(feat * 3, depth, intr, np.eye(4, dtype=np.float32))
        pts, feats = vol.get_point_cloud(tsdf_thresh=0.3)
        assert abs(np.median(feats[:, 0]) - 1.4) < 0.1  # mean(0.7, 2.1)

    def test_estimate_bounds(self):
        intr, depth, _ = self._setup_plane()
        bnds = estimate_bounds([depth], intr, [np.eye(4)])
        assert bnds[2, 0] <= 0.0 and bnds[2, 1] >= 2.0


class TestEMD:
    def test_identical_clouds(self):
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(64, 3)), dtype=jnp.float32)
        d = float(earth_mover_distance(pts, pts))
        # Perfect matching available; approximate matcher gets close to 0.
        assert d < 0.2

    def test_match_is_doubly_stochastic_ish(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
        b = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
        m = np.asarray(approx_match(a, b))  # (M, N)
        np.testing.assert_allclose(m.sum(axis=0), 1.0, atol=0.05)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=0.05)

    def test_translation_increases_cost(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.normal(size=(48, 3)), dtype=jnp.float32)
        b = a + jnp.array([1.0, 0.0, 0.0])
        d0 = float(earth_mover_distance(a, a))
        d1 = float(earth_mover_distance(a, b))
        # Unit translation: each point pays ~1 squared distance.
        assert d1 > d0 + 0.5 * 48

    def test_gradient(self):
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.normal(size=(16, 3)), dtype=jnp.float32)
        b = a + 0.5
        g = jax.grad(lambda x: earth_mover_distance(x, b))(a)
        assert bool(jnp.isfinite(g).all())
        # Moving a toward b should decrease cost: grad points away from b.
        assert float(jnp.sum(g * (a - b))) > 0


class TestChamfer:
    def test_zero_on_identical(self):
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(300, 3)), dtype=jnp.float32)
        out = chamfer_distance(pts, pts, block=128)
        assert out["chamfer"] < 1e-3

    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(200, 3)).astype(np.float32)
        b = rng.normal(size=(150, 3)).astype(np.float32)
        d = np.linalg.norm(a[:, None] - b[None], axis=-1)
        expected = 0.5 * (d.min(1).mean() + d.min(0).mean())
        got = chamfer_distance(jnp.asarray(a), jnp.asarray(b), block=64)
        assert got["chamfer"] == pytest.approx(expected, rel=1e-4)


class TestRelevancy:
    def _make(self):
        from online_lang_splatting_tpu.eval.relevancy import CLIPRelevancy

        rng = np.random.default_rng(0)
        neg = rng.normal(size=(4, 16)).astype(np.float32)
        rel = CLIPRelevancy(neg_embeds=neg)
        return rel, rng

    def test_relevancy_prefers_aligned(self):
        rel, rng = self._make()
        pos = rng.normal(size=(1, 16)).astype(np.float32)
        rel.set_positive_embeds(pos, ["q"])
        pos_n = pos / np.linalg.norm(pos)
        embeds = np.stack([pos_n[0], -pos_n[0]]).astype(np.float32)
        probs = np.asarray(rel.get_relevancy(jnp.asarray(embeds), 0))
        assert probs[0, 0] > probs[1, 0]
        assert probs[0, 0] > 0.5

    def test_max_across_shape(self):
        rel, rng = self._make()
        rel.set_positive_embeds(rng.normal(size=(3, 16)).astype(np.float32))
        sem = jnp.asarray(rng.normal(size=(2, 8, 9, 16)), dtype=jnp.float32)
        out = rel.get_max_across(sem)
        assert out.shape == (2, 3, 8, 9)

    def test_semantic_map(self):
        from online_lang_splatting_tpu.eval.relevancy import CLIPRelevancy

        rng = np.random.default_rng(1)
        classes = rng.normal(size=(5, 16)).astype(np.float32)
        classes /= np.linalg.norm(classes, axis=1, keepdims=True)
        rel = CLIPRelevancy(neg_embeds=rng.normal(size=(4, 16)).astype(np.float32) * 0.01)
        rel.semantic_embeds = jnp.asarray(classes)
        # Build a map whose pixels are exactly class embeddings.
        labels = rng.integers(0, 5, size=(6, 7))
        sem = classes[labels][None]
        pred = np.asarray(rel.get_semantic_map(jnp.asarray(sem)))
        np.testing.assert_array_equal(pred[0], labels)

    def test_embed_table_partial_fallback(self, monkeypatch):
        """Mixed batch: table hits keep their precomputed embeddings and
        ONLY the misses go through the text tower (a whole-batch tower
        pass silently ignored the table — ADVICE r4)."""
        from online_lang_splatting_tpu.eval import relevancy as R

        rng = np.random.default_rng(2)
        table = {"chair": rng.normal(size=16).astype(np.float32)}
        calls = []

        def fake_tower(self, texts):
            calls.append(list(texts))
            out = np.tile(np.arange(16, dtype=np.float32), (len(texts), 1))
            return R._l2n(jnp.asarray(out))

        monkeypatch.setattr(R.CLIPRelevancy, "_tower_encode", fake_tower)
        rel = R.CLIPRelevancy(
            text_params={"stub": 0}, tokenizer=None, embed_table=table
        )
        emb = np.asarray(rel._encode(["chair", "vase"]))
        expect = np.asarray(R._l2n(jnp.asarray(table["chair"])))
        np.testing.assert_allclose(emb[0], expect, rtol=1e-6)
        assert calls[-1] == ["vase"]  # only the miss hit the tower
        # All-miss batches (the NEGATIVES warmup) go through in one call.
        assert calls[0] == list(R.NEGATIVES)


class TestPly:
    def test_roundtrip(self, tmp_path):
        from online_lang_splatting_tpu.utils.ply import read_ply, write_ply

        rng = np.random.default_rng(0)
        fields = {
            "x": rng.normal(size=10).astype(np.float32),
            "y": rng.normal(size=10).astype(np.float32),
            "label": rng.integers(0, 5, 10).astype(np.int32),
        }
        p = tmp_path / "test.ply"
        write_ply(p, fields)
        back = read_ply(p)
        for k in fields:
            np.testing.assert_array_equal(back[k], fields[k])

    def test_gaussian_snapshot_roundtrip(self, tmp_path):
        from online_lang_splatting_tpu.models import gaussians as G
        from online_lang_splatting_tpu.utils.ply import (
            load_gaussians_ply, save_gaussians_ply,
        )

        params = G.empty_params(64, sh_degree=0, lang_dim=15)
        aux = G.empty_aux(64)
        opt = G.init_adam(params)
        rng = np.random.default_rng(0)
        params, aux, opt, _ = G.extend_points(
            params, aux, opt,
            xyz=jnp.asarray(rng.normal(size=(20, 3)), dtype=jnp.float32),
            rgb=jnp.asarray(rng.uniform(size=(20, 3)), dtype=jnp.float32),
            valid=jnp.ones((20,), bool), kf_id=0,
        )
        p = tmp_path / "g.ply"
        save_gaussians_ply(p, params, aux)
        params2, aux2 = load_gaussians_ply(p)
        n = int(aux.active.sum())
        assert int(aux2.active.sum()) == n
        np.testing.assert_allclose(
            np.asarray(params2.xyz[:n]), np.asarray(params.xyz[:n]), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(params2.opacity[:n]), np.asarray(params.opacity[:n]),
            atol=1e-6,
        )


class TestFusedRelevancy:
    """The fused decode→relevancy path (make_fused_relevancy /
    relevancy_all) must match the per-query get_relevancy loop exactly —
    it replaces the eager path that OOM-killed the replica-scale gated
    mIoU run (130 GB host RSS)."""

    def _rel(self, rng, n_pos=3, d=16):
        from online_lang_splatting_tpu.eval.relevancy import CLIPRelevancy

        rel = CLIPRelevancy(
            neg_embeds=rng.normal(size=(4, d)).astype(np.float32)
        )
        rel.set_positive_embeds(
            rng.normal(size=(n_pos, d)).astype(np.float32),
            [f"q{i}" for i in range(n_pos)],
        )
        return rel

    def test_relevancy_all_matches_per_query(self):
        rng = np.random.default_rng(3)
        rel = self._rel(rng)
        emb = jnp.asarray(rng.normal(size=(37, 16)), jnp.float32)
        fused = np.asarray(rel.relevancy_all(emb))  # (P, N)
        for j in range(3):
            ref = np.asarray(rel.get_relevancy(emb, j))[:, 0]
            np.testing.assert_allclose(fused[j], ref, rtol=1e-6, atol=1e-6)

    def test_fused_map_matches_unfused(self):
        from online_lang_splatting_tpu.eval.lerf_eval import (
            make_fused_relevancy,
        )

        rng = np.random.default_rng(4)
        rel = self._rel(rng)
        # A linear "decoder" codes(5) → clip(16), jit-traceable.
        W = jnp.asarray(rng.normal(size=(5, 16)), jnp.float32)
        decode = lambda z: z @ W  # noqa: E731
        h, w = 6, 9
        codes = rng.normal(size=(h * w, 5)).astype(np.float32)
        fused = make_fused_relevancy(decode, block=16)
        got = fused(codes, rel, h, w)  # pads 54 → 64 (4 blocks of 16)
        sem = np.asarray(jnp.asarray(codes) @ W).reshape(1, h, w, 16)
        ref = np.asarray(rel.get_max_across(jnp.asarray(sem)))[0]
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def test_scores_match_with_and_without_valid_map(self):
        from online_lang_splatting_tpu.eval.lerf_eval import (
            activate_stream, lerf_localization,
        )

        rng = np.random.default_rng(5)
        rel = self._rel(rng, n_pos=2)
        h, w = 24, 32
        sem = rng.normal(size=(1, h, w, 16)).astype(np.float32)
        img_ann = {}
        for k, name in enumerate(["q0", "q1"]):
            mask = np.zeros((h, w), np.uint8)
            mask[4 + k: 12 + k, 6: 20] = 1
            img_ann[name] = {
                "mask": mask,
                "bboxes": np.array([[6, 4 + k, 19, 11 + k]]),
            }
        # positives q0/q1 already set via set_positive_embeds in _rel
        valid = np.asarray(rel.get_max_across(jnp.asarray(sem)))
        ious_a, _ = activate_stream(jnp.asarray(sem), rel, img_ann)
        ious_b, _ = activate_stream(None, rel, img_ann, valid_map=valid)
        np.testing.assert_allclose(ious_a, ious_b)
        acc_a = lerf_localization(jnp.asarray(sem), rel, img_ann)
        acc_b = lerf_localization(None, rel, img_ann, valid_map=valid)
        assert acc_a == acc_b
