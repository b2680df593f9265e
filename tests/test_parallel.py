"""Multi-chip SPMD paths on the 8-device virtual CPU mesh."""

import numpy as np


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def _tiny_mapping_problem(s, lang_dim=15):
    import jax.numpy as jnp

    from online_lang_splatting_tpu.models import gaussians as G
    from online_lang_splatting_tpu.ops import graphics
    from online_lang_splatting_tpu.ops.raster import RasterSettings

    rng = np.random.default_rng(1)
    cap = 256
    params = G.empty_params(cap, sh_degree=0, lang_dim=lang_dim)
    aux = G.empty_aux(cap)
    opt = G.init_adam(params)
    xyz = jnp.asarray(rng.normal(size=(96, 3)) * 0.5 + [0, 0, 3.0], jnp.float32)
    rgb = jnp.asarray(rng.uniform(size=(96, 3)), jnp.float32)
    params, aux, opt, _ = G.extend_points(
        params, aux, opt, xyz=xyz, rgb=rgb,
        valid=jnp.ones((96,), bool), kf_id=0,
    )
    w, h, f = 32, 24, 30.0
    settings = RasterSettings(
        image_height=h, image_width=w,
        tanfovx=w / (2 * f), tanfovy=h / (2 * f),
        sh_degree=0, backend="tpu", max_instances=4096,
    )
    proj = graphics.projection_matrix(0.01, 100.0, w / 2, h / 2, f, f, w, h)
    z3 = jnp.zeros((s, 3), jnp.float32)
    zs = jnp.zeros((s,), jnp.float32)
    args = (
        params, opt, aux, proj,
        jnp.broadcast_to(jnp.eye(3), (s, 3, 3)),
        jnp.asarray(rng.normal(size=(s, 3)) * 0.01, jnp.float32),
        jnp.asarray(rng.normal(size=(s,)) * 0.01, jnp.float32),  # exposure a
        jnp.asarray(rng.normal(size=(s,)) * 0.01, jnp.float32),  # exposure b
        (z3, z3, zs, zs), (z3, z3, zs, zs), jnp.zeros((s,), jnp.float32),
        jnp.asarray(rng.uniform(size=(s, 3, h, w)), jnp.float32),
        jnp.full((s, 1, h, w), 3.0, jnp.float32),
        jnp.asarray(rng.normal(size=(s, lang_dim, 192, 192)) * 0.1, jnp.float32),
        jnp.asarray([True] * (s - 1) + [False]),           # one invalid slot
        jnp.asarray([True, False] + [True] * (s - 2)),     # mixed lang_on
        jnp.asarray([False] + [True] * (s - 1)),           # pose_opt
        jnp.ones((s,), bool),                              # exp_opt
        G.LearningRates(*[jnp.float32(1e-3)] * 7),
        jnp.float32(1.0),
    )
    return settings, args


def test_dp_mapping_iteration_matches_single_device():
    """The FULL dp mapping step (keyframe slots sharded over 8 devices)
    must reproduce the single-device mapping_iteration bit-for-bit-ish:
    params, Adam state, aux stats, per-slot pose/exposure updates."""
    import jax
    import jax.numpy as jnp

    from online_lang_splatting_tpu.parallel.mesh import (
        dp_mapping_iteration, make_mesh,
    )
    from online_lang_splatting_tpu.slam.backend import mapping_iteration

    s = 8
    settings, args = _tiny_mapping_problem(s)

    ref = mapping_iteration(*args, settings=settings, n_slots=s,
                            init_mode=False)
    mesh = make_mesh(8)
    dp = dp_mapping_iteration(settings, mesh, s, False)(*args)

    names = ["params", "opt", "aux", "r", "t", "ea", "eb", "pose_state",
             "occ_vis", "loss", "ovf", "demand"]
    for name, a, b in zip(names, ref, dp):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            la, lb = jnp.asarray(la), jnp.asarray(lb)
            assert la.shape == lb.shape, (name, la.shape, lb.shape)
            if la.size == 0:
                continue
            if la.dtype == bool:
                assert (la == lb).all(), name
            else:
                diff = float(jnp.abs(la.astype(jnp.float32)
                                     - lb.astype(jnp.float32)).max())
                assert diff < 1e-5, (name, diff)


def test_dp_ae_matches_single_device():
    import jax
    import jax.numpy as jnp

    from online_lang_splatting_tpu.models.autoencoder import (
        EncoderDecoderOnline, make_online_optimizer, online_train_step,
    )
    from online_lang_splatting_tpu.parallel.mesh import (
        dp_ae_train_step, make_mesh,
    )

    model = EncoderDecoderOnline()
    params = model.init(jax.random.key(0), jnp.zeros((1, 32)))["params"]
    optimizer = make_online_optimizer()
    opt_state = optimizer.init(params)
    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.normal(size=(64, 32)), dtype=jnp.float32)

    # Single-device reference step.
    step1 = jax.jit(online_train_step(model, optimizer))
    p1, _, loss1 = step1(params, opt_state, batch)

    # 8-way data parallel: same batch sharded; pmean(grads) == mean grad.
    mesh = make_mesh(8)
    stepn = dp_ae_train_step(model, optimizer, mesh)
    pn, _, lossn = stepn(params, opt_state, batch)

    assert float(lossn) == float(loss1) or abs(float(lossn) - float(loss1)) < 1e-5
    diff = max(
        float(jnp.abs(a - b).max()) for a, b in zip(
            jax.tree.leaves(p1), jax.tree.leaves(pn)
        )
    )
    assert diff < 1e-5
