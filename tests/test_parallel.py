"""Multi-chip SPMD paths on the 8-device virtual CPU mesh."""

import numpy as np


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


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
