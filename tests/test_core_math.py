"""Core math ops: Lie groups, camera matrices, SH, losses.

Oracle values come from independent formulations (scipy-free closed forms,
torch reference re-derivations on CPU) rather than the reference repo's code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from online_lang_splatting_tpu.ops import graphics, lie, losses, sh


class TestLie:
    def test_so3_exp_identity(self):
        r = lie.so3_exp(jnp.zeros(3))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-7)

    def test_so3_exp_axis_angle(self):
        # Rotation of pi/2 about z.
        theta = jnp.array([0.0, 0.0, np.pi / 2])
        r = lie.so3_exp(theta)
        expected = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        np.testing.assert_allclose(r, expected, atol=1e-6)

    def test_so3_orthonormal(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            theta = jnp.asarray(rng.normal(size=3))
            r = np.asarray(lie.so3_exp(theta.astype(jnp.float32)))
            np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)

    def test_se3_exp_pure_translation(self):
        tau = jnp.array([1.0, 2.0, 3.0, 0.0, 0.0, 0.0])
        t = lie.se3_exp(tau)
        np.testing.assert_allclose(t[:3, 3], [1.0, 2.0, 3.0], atol=1e-7)
        np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=1e-7)

    def test_se3_exp_small_angle_continuity(self):
        # Both sides of the 1e-5 Taylor switch match an exact float64 oracle.
        def se3_exp_np(tau):
            rho, theta = tau[:3], tau[3:]
            angle = np.linalg.norm(theta)
            w = np.array([
                [0, -theta[2], theta[1]],
                [theta[2], 0, -theta[0]],
                [-theta[1], theta[0], 0],
            ])
            w2 = w @ w
            if angle < 1e-12:
                r, v = np.eye(3) + w, np.eye(3) + 0.5 * w
            else:
                r = np.eye(3) + np.sin(angle) / angle * w + (1 - np.cos(angle)) / angle**2 * w2
                v = (np.eye(3) + (1 - np.cos(angle)) / angle**2 * w
                     + (angle - np.sin(angle)) / angle**3 * w2)
            out = np.eye(4)
            out[:3, :3], out[:3, 3] = r, v @ rho
            return out

        for ang in (9e-6, 1.1e-5, 0.5):
            tau = np.array([0.1, -0.2, 0.3, 0.0, 0.0, ang])
            got = lie.se3_exp(jnp.asarray(tau, dtype=jnp.float32))
            np.testing.assert_allclose(got, se3_exp_np(tau), atol=1e-6)

    def test_se3_exp_gradient_finite_at_zero(self):
        g = jax.jacobian(lie.se3_exp)(jnp.zeros(6))
        assert np.all(np.isfinite(np.asarray(g)))
        # d(translation)/d(rho) at identity is I.
        np.testing.assert_allclose(np.asarray(g)[:3, 3, :3], np.eye(3), atol=1e-5)
        # d(R)/d(theta) at identity is the skew generator.
        np.testing.assert_allclose(
            np.asarray(g)[:3, :3, 3:],
            np.stack([np.asarray(lie.skew(e)) for e in np.eye(3)], axis=-1),
            atol=1e-5,
        )

    def test_update_pose_roundtrip(self):
        rng = np.random.default_rng(1)
        r0 = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3), dtype=jnp.float32)))
        t0 = rng.normal(size=3).astype(np.float32)
        trans = jnp.asarray(rng.normal(size=3) * 0.01, dtype=jnp.float32)
        rot = jnp.asarray(rng.normal(size=3) * 0.01, dtype=jnp.float32)
        new_r, new_t, conv = lie.update_pose(jnp.asarray(r0), jnp.asarray(t0), trans, rot)
        expected = np.asarray(
            lie.se3_exp(jnp.concatenate([trans, rot]))
        ) @ np.asarray(lie.rt_to_mat4(jnp.asarray(r0), jnp.asarray(t0)))
        np.testing.assert_allclose(new_r, expected[:3, :3], atol=1e-6)
        np.testing.assert_allclose(new_t, expected[:3, 3], atol=1e-6)
        assert not bool(conv)
        _, _, conv2 = lie.update_pose(
            jnp.asarray(r0), jnp.asarray(t0), jnp.zeros(3), jnp.zeros(3)
        )
        assert bool(conv2)


class TestGraphics:
    def test_projection_center_pixel(self):
        w, h, fx, fy = 640, 480, 600.0, 600.0
        cx, cy = w / 2, h / 2
        p = graphics.projection_matrix(0.01, 100.0, cx, cy, fx, fy, w, h)
        # A point on the optical axis projects to NDC (0, 0).
        pt = jnp.array([[0.0, 0.0, 5.0]])
        hom = graphics.transform_points(pt, p)[0]
        ndc = hom[:3] / hom[3]
        np.testing.assert_allclose(ndc[:2], [0.0, 0.0], atol=1e-6)
        # w equals view-space z.
        assert hom[3] == pytest.approx(5.0, abs=1e-5)

    def test_projection_pinhole_consistency(self):
        w, h, fx, fy, cx, cy = 640, 480, 580.0, 570.0, 320.5, 241.5
        p = graphics.projection_matrix(0.01, 100.0, cx, cy, fx, fy, w, h)
        pt = jnp.array([[0.3, -0.2, 2.0]])
        hom = graphics.transform_points(pt, p)[0]
        ndc = hom / hom[3]
        px = graphics.ndc_to_pix(ndc[0], w)
        py = graphics.ndc_to_pix(ndc[1], h)
        # Classic pinhole: u = fx*x/z + cx - 0.5 (pixel-center convention).
        assert px == pytest.approx(fx * 0.3 / 2.0 + cx - 0.5, abs=1e-3)
        assert py == pytest.approx(fy * -0.2 / 2.0 + cy - 0.5, abs=1e-3)

    def test_world_to_view_inverse_center(self):
        rng = np.random.default_rng(2)
        r = np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3), dtype=jnp.float32)))
        t = rng.normal(size=3).astype(np.float32)
        w2c = graphics.world_to_view(jnp.asarray(r), jnp.asarray(t))
        center = jnp.linalg.inv(w2c)[:3, 3]
        np.testing.assert_allclose(np.asarray(w2c[:3, :3] @ center + w2c[:3, 3]), 0.0, atol=1e-5)


class TestSH:
    def test_dc_only(self):
        shs = jnp.zeros((4, 16, 3)).at[:, 0, :].set(1.0)
        colors = sh.sh_to_color(3, shs, jnp.ones((4, 3)), jnp.zeros(3))
        np.testing.assert_allclose(colors, sh.SH_C0 * 1.0 + 0.5, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.1, 0.5, 0.9]])
        np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_clamping(self):
        shs = jnp.zeros((1, 16, 3)).at[:, 0, :].set(-10.0)
        colors = sh.sh_to_color(3, shs, jnp.ones((1, 3)), jnp.zeros(3))
        np.testing.assert_allclose(colors, 0.0, atol=1e-7)
        # Clamped channels receive zero gradient.
        g = jax.grad(lambda s: sh.sh_to_color(3, s, jnp.ones((1, 3)), jnp.zeros(3)).sum())(shs)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)

    def test_degree1_direction_dependence(self):
        shs = jnp.zeros((1, 4, 3)).at[0, 3, 0].set(1.0)  # x band, red
        means = jnp.array([[1.0, 0.0, 0.0]])
        c_pos = sh.sh_to_color(1, shs, means, jnp.zeros(3))
        c_neg = sh.sh_to_color(1, shs, -means, jnp.zeros(3))
        assert c_pos[0, 0] == pytest.approx(0.5 - sh.SH_C1, abs=1e-6)
        assert c_neg[0, 0] == pytest.approx(0.5 + sh.SH_C1, abs=1e-6)


class TestLosses:
    def test_ssim_identical(self):
        rng = np.random.default_rng(3)
        img = jnp.asarray(rng.uniform(size=(3, 32, 32)), dtype=jnp.float32)
        assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_ssim_matches_torch_reference(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        rng = np.random.default_rng(4)
        a = rng.uniform(size=(3, 24, 24)).astype(np.float32)
        b = np.clip(a + rng.normal(size=a.shape).astype(np.float32) * 0.1, 0, 1)

        # Independent torch re-derivation of windowed SSIM.
        x = np.arange(11)
        g = np.exp(-((x - 5) ** 2) / (2 * 1.5**2))
        g = (g / g.sum()).astype(np.float32)
        win = torch.from_numpy(np.outer(g, g)).expand(3, 1, 11, 11).contiguous()
        ta, tb = torch.from_numpy(a)[None], torch.from_numpy(b)[None]
        conv = lambda i: F.conv2d(i, win, padding=5, groups=3)
        mu1, mu2 = conv(ta), conv(tb)
        s1 = conv(ta * ta) - mu1**2
        s2 = conv(tb * tb) - mu2**2
        s12 = conv(ta * tb) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        expected = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) /
                    ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))).mean().item()
        assert float(losses.ssim(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(expected, abs=1e-5)

    def test_psnr(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        assert float(losses.psnr(a, b)) == pytest.approx(20.0, abs=1e-4)

    def test_scharr_gradient_on_ramp(self):
        # Horizontal ramp: constant d/dx, zero d/dy (away from padding).
        w = jnp.broadcast_to(jnp.arange(16, dtype=jnp.float32), (16, 16))
        grad_v, grad_h = losses.image_gradient(w[None])
        np.testing.assert_allclose(np.asarray(grad_h)[0, 4:-4, 4:-4], -1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(grad_v)[0, 4:-4, 4:-4], 0.0, atol=1e-5)

    def test_gradient_mask(self):
        img = jnp.zeros((1, 8, 8)).at[0, 4, 4].set(1.0)
        mask_v, _ = losses.image_gradient_mask(img)
        assert not bool(mask_v.any())
        img2 = jnp.ones((1, 8, 8))
        mask_v2, _ = losses.image_gradient_mask(img2)
        assert bool(mask_v2.all())


class TestGradMaskDevice:
    """The one-dispatch device grad mask must match the original
    host/numpy per-block-median computation exactly."""

    def _host_reference(self, image, edge_threshold, replica):
        from online_lang_splatting_tpu.ops import losses

        gray = jnp.mean(jnp.asarray(image), axis=0, keepdims=True)
        grad_v, grad_h = losses.image_gradient(gray)
        mask_v, mask_h = losses.image_gradient_mask(gray)
        intensity = np.asarray(jnp.sqrt(
            jnp.square(grad_v * mask_v) + jnp.square(grad_h * mask_h)
        ))
        if not replica:
            med = np.median(intensity)
            return (intensity > med * edge_threshold).astype(np.float32)
        rows = cols = 32
        h, w = image.shape[1], image.shape[2]
        bh, bw = h // rows, w // cols
        blocks = intensity[0, : rows * bh, : cols * bw].reshape(
            rows, bh, cols, bw)
        med = np.median(blocks, axis=(1, 3), keepdims=True)
        out = (blocks > med * edge_threshold).astype(np.float32)
        full = np.zeros((h, w), np.float32)
        full[: rows * bh, : cols * bw] = out.reshape(rows * bh, cols * bw)
        return full[None]

    @pytest.mark.parametrize("replica", [True, False])
    def test_matches_host_reference(self, replica):
        from online_lang_splatting_tpu.slam.camera import _grad_mask_device

        g = np.random.default_rng(11)
        img = g.uniform(0, 1, size=(3, 70, 66)).astype(np.float32)
        got = np.asarray(_grad_mask_device(
            jnp.asarray(img), replica, 32, 32, jnp.float32(1.1)))
        ref = self._host_reference(img, 1.1, replica)
        np.testing.assert_array_equal(got, ref)
