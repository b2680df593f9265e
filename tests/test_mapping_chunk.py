"""Chunked mapping (N iterations per dispatch) must reproduce the
per-iteration mapping_iteration path exactly: same Gaussian params/Adam,
same window pose/exposure trajectory, same densification stats, same
final occ visibility."""

import jax
import jax.numpy as jnp
import numpy as np

from online_lang_splatting_tpu.models import gaussians as G
from online_lang_splatting_tpu.ops import graphics
from online_lang_splatting_tpu.ops.raster import RasterSettings
from online_lang_splatting_tpu.slam.backend import (
    make_mapping_chunk, mapping_iteration,
)

LR_CFG = (0.001, 0.00002, 0.01, 3000)


def _setup(n_win=2, n_stack=5, lang_dim=15, h=24, w=32):
    rng = np.random.default_rng(3)
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
    f = 30.0
    settings = RasterSettings(
        image_height=h, image_width=w,
        tanfovx=w / (2 * f), tanfovy=h / (2 * f),
        sh_degree=0, backend="tpu", max_instances=4096,
    )
    proj = graphics.projection_matrix(0.01, 100.0, w / 2, h / 2, f, f, w, h)

    stack_imgs = jnp.asarray(rng.uniform(size=(n_stack, 3, h, w)), jnp.float32)
    stack_deps = jnp.full((n_stack, 1, h, w), 3.0, jnp.float32)
    stack_langs = jnp.asarray(
        rng.normal(size=(n_stack, lang_dim, 192, 192)) * 0.1, jnp.float32
    )
    stack_lang_on = jnp.asarray([True, False, True, True, True])

    win = dict(
        r=jnp.broadcast_to(jnp.eye(3), (n_win, 3, 3)),
        t=jnp.asarray(rng.normal(size=(n_win, 3)) * 0.01, jnp.float32),
        ea=jnp.asarray(rng.normal(size=(n_win,)) * 0.01, jnp.float32),
        eb=jnp.asarray(rng.normal(size=(n_win,)) * 0.01, jnp.float32),
        imgs=jnp.take(stack_imgs, jnp.arange(n_win), axis=0),
        deps=jnp.take(stack_deps, jnp.arange(n_win), axis=0),
        langs=jnp.take(stack_langs, jnp.arange(n_win), axis=0),
        valid=jnp.ones((n_win,), bool),
        lang_on=stack_lang_on[:n_win],
    )
    pose_opt = jnp.asarray([False, True, False, False])
    exp_opt = jnp.asarray([True, True, False, False])
    stack = (stack_imgs, stack_deps, stack_langs, stack_lang_on)
    return params, opt, aux, settings, proj, win, pose_opt, exp_opt, stack


def test_chunk_matches_per_iteration():
    n_win, n_iters = 2, 3
    n_slots = n_win + 2
    (params, opt, aux, settings, proj, win, pose_opt, exp_opt,
     stack) = _setup(n_win)
    stack_imgs, stack_deps, stack_langs, stack_lang_on = stack
    rng = np.random.default_rng(7)
    rand_rows = jnp.asarray(rng.integers(2, 5, size=(n_iters, 2)), jnp.int32)
    rand_valid = jnp.asarray(
        [[True, True], [True, False], [True, True]]
    )
    rand_r = jnp.broadcast_to(jnp.eye(3), (n_iters, 2, 3, 3))
    rand_t = jnp.asarray(rng.normal(size=(n_iters, 2, 3)) * 0.01, jnp.float32)
    rand_ea = jnp.zeros((n_iters, 2), jnp.float32)
    rand_eb = jnp.zeros((n_iters, 2), jnp.float32)
    lw = jnp.float32(1.0)
    fixed_lrs = G.LearningRates(*[jnp.float32(1e-3)] * 7)

    # --- reference: per-iteration path, host-carried window poses ---------
    z3 = jnp.zeros((n_slots, 3), jnp.float32)
    zs = jnp.zeros((n_slots,), jnp.float32)
    pm, pv, pt = (z3, z3, zs, zs), (z3, z3, zs, zs), jnp.zeros((n_slots,), jnp.float32)
    p_ref, o_ref, a_ref = params, opt, aux
    wr, wt, wea, web = win["r"], win["t"], win["ea"], win["eb"]
    for j in range(n_iters):
        rows = rand_rows[j]
        slot_r = jnp.concatenate([wr, rand_r[j]])
        slot_t = jnp.concatenate([wt, rand_t[j]])
        slot_ea = jnp.concatenate([wea, rand_ea[j]])
        slot_eb = jnp.concatenate([web, rand_eb[j]])
        imgs = jnp.concatenate([win["imgs"], jnp.take(stack_imgs, rows, axis=0)])
        deps = jnp.concatenate([win["deps"], jnp.take(stack_deps, rows, axis=0)])
        lngs = jnp.concatenate([win["langs"], jnp.take(stack_langs, rows, axis=0)])
        valid = jnp.concatenate([win["valid"], rand_valid[j]])
        lang_on = jnp.concatenate(
            [win["lang_on"], jnp.take(stack_lang_on, rows) & rand_valid[j]]
        )
        lrs = fixed_lrs._replace(
            xyz=G.expon_lr(
                jnp.float32(j + 1), LR_CFG[0], LR_CFG[1],
                lr_delay_mult=LR_CFG[2], max_steps=LR_CFG[3],
            )
        )
        (p_ref, o_ref, a_ref, new_r, new_t, new_ea, new_eb,
         (pm, pv, pt), occ_ref, _loss, _ovf, _dem) = mapping_iteration(
            p_ref, o_ref, a_ref, proj,
            slot_r, slot_t, slot_ea, slot_eb, pm, pv, pt,
            imgs, deps, lngs, valid, lang_on, pose_opt, exp_opt,
            lrs, lw, settings=settings, n_slots=n_slots, init_mode=False,
        )
        wr, wt, wea, web = new_r[:n_win], new_t[:n_win], new_ea[:n_win], new_eb[:n_win]

    # --- chunked path: one dispatch ----------------------------------------
    pm0, pv0 = (z3, z3, zs, zs), (z3, z3, zs, zs)
    fn = make_mapping_chunk(settings, n_slots, n_iters, False, LR_CFG)
    (p_c, o_c, a_c, wr_c, wt_c, wea_c, web_c, (pm_c, pv_c, pt_c),
     occ_c, losses, ovf, cap_ovf, _dem) = fn(
        params, opt, aux, proj,
        win["r"], win["t"], win["ea"], win["eb"],
        win["imgs"], win["deps"], win["langs"], win["valid"], win["lang_on"],
        pose_opt, exp_opt,
        pm0, pv0, jnp.zeros((n_slots,), jnp.float32),
        stack_imgs, stack_deps, stack_langs, stack_lang_on,
        rand_rows, rand_valid, rand_r, rand_t, rand_ea, rand_eb,
        jnp.float32(0.0), fixed_lrs, lw,
    )

    def close(a, b, name, tol=1e-5):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            la, lb = jnp.asarray(la), jnp.asarray(lb)
            if la.size == 0:
                continue
            if la.dtype == bool:
                assert (la == lb).all(), name
            else:
                d = float(jnp.abs(la.astype(jnp.float32)
                                  - lb.astype(jnp.float32)).max())
                assert d < tol, (name, d)

    close(p_ref, p_c, "params")
    close(o_ref, o_c, "opt")
    close(a_ref, a_c, "aux")
    close((wr, wt, wea, web), (wr_c, wt_c, wea_c, web_c), "window poses")
    close((pm, pv, pt), (pm_c, pv_c, pt_c), "pose adam")
    close(occ_ref, occ_c, "occ")
    assert losses.shape == (n_iters,)
    assert not bool(ovf)
    assert not bool(cap_ovf)  # no cadence config -> never fires


def test_chunk_cadence_matches_host_events():
    """In-chunk densify/opacity-reset cadence (lax.cond inside the scan)
    must reproduce the host-driven path: mapping_iteration followed by
    G.densify_and_prune / reset at the exact event iterations, with the
    same fold_in(base_key, count) key schedule."""
    n_win, n_iters = 2, 6
    n_slots = n_win + 2
    (params, opt, aux, settings, proj, win, pose_opt, exp_opt,
     stack) = _setup(n_win)
    stack_imgs, stack_deps, stack_langs, stack_lang_on = stack
    rng = np.random.default_rng(11)
    rand_rows = jnp.asarray(rng.integers(2, 5, size=(n_iters, 2)), jnp.int32)
    rand_valid = jnp.ones((n_iters, 2), bool)
    rand_r = jnp.broadcast_to(jnp.eye(3), (n_iters, 2, 3, 3))
    rand_t = jnp.asarray(rng.normal(size=(n_iters, 2, 3)) * 0.01, jnp.float32)
    rand_ea = jnp.zeros((n_iters, 2), jnp.float32)
    rand_eb = jnp.zeros((n_iters, 2), jnp.float32)
    lw = jnp.float32(1.0)
    fixed_lrs = G.LearningRates(*[jnp.float32(1e-3)] * 7)
    base_key = jax.random.PRNGKey(42)

    # One densify event (count 4: 96 clones -> 192 active, no capacity
    # overflow) and two opacity resets (counts 3, 6). Thresholds sit far
    # from any data boundary so discrete decisions can't flip on float
    # reassociation: max_grad=0 (all active clone), huge extent (nothing
    # splits), tiny min_opacity (nothing prunes).
    upd_every, upd_off, rst_every = 4, 0, 3
    cad = (upd_every, upd_off, rst_every, 0.0, 1e-6, 1e6, None, 0.01)

    z3 = jnp.zeros((n_slots, 3), jnp.float32)
    zs = jnp.zeros((n_slots,), jnp.float32)

    # --- reference: host loop with explicit events ------------------------
    pm, pv, pt = (z3, z3, zs, zs), (z3, z3, zs, zs), zs
    p_ref, o_ref, a_ref = params, opt, aux
    wr, wt, wea, web = win["r"], win["t"], win["ea"], win["eb"]
    for j in range(n_iters):
        count = j + 1
        slot_r = jnp.concatenate([wr, rand_r[j]])
        slot_t = jnp.concatenate([wt, rand_t[j]])
        slot_ea = jnp.concatenate([wea, rand_ea[j]])
        slot_eb = jnp.concatenate([web, rand_eb[j]])
        imgs = jnp.concatenate(
            [win["imgs"], jnp.take(stack_imgs, rand_rows[j], axis=0)])
        deps = jnp.concatenate(
            [win["deps"], jnp.take(stack_deps, rand_rows[j], axis=0)])
        lngs = jnp.concatenate(
            [win["langs"], jnp.take(stack_langs, rand_rows[j], axis=0)])
        valid = jnp.concatenate([win["valid"], rand_valid[j]])
        lang_on = jnp.concatenate(
            [win["lang_on"], jnp.take(stack_lang_on, rand_rows[j])]
        )
        lrs = fixed_lrs._replace(
            xyz=G.expon_lr(
                jnp.float32(count), LR_CFG[0], LR_CFG[1],
                lr_delay_mult=LR_CFG[2], max_steps=LR_CFG[3],
            )
        )
        (p_ref, o_ref, a_ref, new_r, new_t, new_ea, new_eb,
         (pm, pv, pt), occ_ref, _loss, _ovf, _dem) = mapping_iteration(
            p_ref, o_ref, a_ref, proj,
            slot_r, slot_t, slot_ea, slot_eb, pm, pv, pt,
            imgs, deps, lngs, valid, lang_on, pose_opt, exp_opt,
            lrs, lw, settings=settings, n_slots=n_slots, init_mode=False,
        )
        wr, wt, wea, web = (new_r[:n_win], new_t[:n_win],
                            new_ea[:n_win], new_eb[:n_win])
        do_update = count % upd_every == upd_off
        if do_update:
            key = jax.random.fold_in(base_key, count)
            p_ref, a_ref, o_ref, _cap = G.densify_and_prune(
                p_ref, a_ref, o_ref, key, max_grad=cad[3],
                min_opacity=cad[4], extent=cad[5], max_screen_size=cad[6],
                percent_dense=cad[7],
            )
        if count % rst_every == 0 and not do_update:
            visible = jnp.any(
                occ_ref[:n_win] & win["valid"][:, None], axis=0
            )
            p_ref, o_ref = G.reset_opacity_nonvisible(p_ref, o_ref, visible)
    assert int(a_ref.active.sum()) != 96  # events actually mutated the map

    # --- chunked path with on-device cadence ------------------------------
    fn = make_mapping_chunk(
        settings, n_slots, n_iters, False, LR_CFG, None, cad
    )
    (p_c, o_c, a_c, wr_c, wt_c, wea_c, web_c, _pstate,
     occ_c, losses, ovf, cap_ovf, _dem) = fn(
        params, opt, aux, proj,
        win["r"], win["t"], win["ea"], win["eb"],
        win["imgs"], win["deps"], win["langs"], win["valid"], win["lang_on"],
        pose_opt, exp_opt,
        (z3, z3, zs, zs), (z3, z3, zs, zs), zs,
        stack_imgs, stack_deps, stack_langs, stack_lang_on,
        rand_rows, rand_valid, rand_r, rand_t, rand_ea, rand_eb,
        jnp.float32(0.0), fixed_lrs, lw, base_key,
    )

    # Discrete state must match EXACTLY (same events, same keys, same
    # allocation); float state tolerates reassociation drift between the
    # fused chunk program and the separate host-path programs (amplified
    # through Adam's sqrt/eps).
    def close(a, b, name, tol):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            la, lb = jnp.asarray(la), jnp.asarray(lb)
            if la.size == 0:
                continue
            if la.dtype == bool or jnp.issubdtype(la.dtype, jnp.integer):
                assert (la == lb).all(), name
            else:
                d = float(jnp.abs(la.astype(jnp.float32)
                                  - lb.astype(jnp.float32)).max())
                assert d < tol, (name, d)

    assert (a_ref.active == a_c.active).all()
    close(p_ref, p_c, "params", 5e-3)
    close(o_ref, o_c, "opt", 5e-3)
    close(a_ref, a_c, "aux", 5e-3)
    close((wr, wt, wea, web), (wr_c, wt_c, wea_c, web_c), "window poses",
          5e-3)
    assert not bool(ovf) and not bool(cap_ovf)


def test_chunk_live_masking_matches_shorter_program():
    """A live-masked chunk (n_live < n_iters) must equal the dedicated
    shorter program bit-for-bit: dead tail steps pass the carry through a
    lax.cond and contribute zero loss/overflow. This is what lets ONE
    program per (mode, bucket) serve every chunk length instead of
    compiling/loading a ladder of shorter programs (backend.map)."""
    n_win, n_prog, n_live = 2, 6, 4
    n_slots = n_win + 2
    (params, opt, aux, settings, proj, win, pose_opt, exp_opt,
     stack) = _setup(n_win)
    stack_imgs, stack_deps, stack_langs, stack_lang_on = stack
    rng = np.random.default_rng(23)
    rand_rows = jnp.asarray(rng.integers(2, 5, size=(n_prog, 2)), jnp.int32)
    rand_valid = jnp.ones((n_prog, 2), bool)
    rand_r = jnp.broadcast_to(jnp.eye(3), (n_prog, 2, 3, 3))
    rand_t = jnp.asarray(rng.normal(size=(n_prog, 2, 3)) * 0.01, jnp.float32)
    rand_ea = jnp.zeros((n_prog, 2), jnp.float32)
    rand_eb = jnp.zeros((n_prog, 2), jnp.float32)
    lw = jnp.float32(1.0)
    fixed_lrs = G.LearningRates(*[jnp.float32(1e-3)] * 7)
    base_key = jax.random.PRNGKey(7)
    cad = (4, 0, 3, 0.0, 1e-6, 1e6, None, 0.01)
    z3 = jnp.zeros((n_slots, 3), jnp.float32)
    zs = jnp.zeros((n_slots,), jnp.float32)

    common = (
        params, opt, aux, proj,
        win["r"], win["t"], win["ea"], win["eb"],
        win["imgs"], win["deps"], win["langs"], win["valid"], win["lang_on"],
        pose_opt, exp_opt,
        (z3, z3, zs, zs), (z3, z3, zs, zs), zs,
        stack_imgs, stack_deps, stack_langs, stack_lang_on,
    )

    def tail(n):
        return (
            rand_rows[:n], rand_valid[:n], rand_r[:n], rand_t[:n],
            rand_ea[:n], rand_eb[:n],
            jnp.float32(0.0), fixed_lrs, lw, base_key,
        )

    fn_short = make_mapping_chunk(settings, n_slots, n_live, False,
                                  LR_CFG, None, cad)
    out_s = fn_short(*common, *tail(n_live))
    fn_mask = make_mapping_chunk(settings, n_slots, n_prog, False,
                                 LR_CFG, None, cad)
    out_m = fn_mask(*common, *tail(n_prog), n_live=jnp.int32(n_live))

    # Identical per-iteration programs on the live prefix -> exact match.
    for i, (a, b) in enumerate(zip(out_s[:9], out_m[:9])):
        for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            la, lb = jnp.asarray(la), jnp.asarray(lb)
            assert la.shape == lb.shape, i
            assert (la == lb).all(), i
    losses_s, losses_m = out_s[9], out_m[9]
    assert losses_m.shape == (n_prog,)
    assert (losses_m[:n_live] == losses_s).all()
    assert (losses_m[n_live:] == 0.0).all()
    assert bool(out_m[10]) == bool(out_s[10])
    assert bool(out_m[11]) == bool(out_s[11])
    assert int(out_m[12]) == int(out_s[12])  # peak instance demand


def test_window_writeback_drops_nonfinite_poses():
    """The backend's host writeback must never commit a non-finite
    keyframe pose/exposure (mirror of the frontend tracking guard): on
    the 300-frame hardware run, keyframes 118-134 went non-finite
    through this writeback (NaN pose grads once a drifted keyframe's
    valid pixels vanished) and poisoned the cv motion model. Finite
    updates commit; non-finite ones keep the previous camera state and
    still record visibility."""
    from online_lang_splatting_tpu.slam.backend import BackEnd

    class _Cam:
        def __init__(self):
            self.r = np.eye(3, dtype=np.float32)
            self.t = np.zeros(3, np.float32)
            self.exposure_a = 0.1
            self.exposure_b = 0.2

        def update_rt(self, r, t):
            self.r, self.t = np.asarray(r), np.asarray(t)

    be = BackEnd.__new__(BackEnd)
    be.viewpoints = {0: _Cam(), 1: _Cam()}
    be.occ_aware_visibility = {}
    window = [0, 1]
    good_r = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    good_r[0] = 2 * np.eye(3)
    new_t = np.ones((2, 3), np.float32)
    new_t[1, 0] = np.nan  # keyframe 1's pose diverged
    new_ea = np.array([0.5, np.inf], np.float32)
    new_eb = np.array([0.6, 0.7], np.float32)
    occ = [np.ones(4, bool), np.zeros(4, bool)]
    be._commit_window_host(
        window, np.array([True, True]), np.array([True, True]),
        good_r, new_t, new_ea, new_eb, occ,
    )
    # Finite row committed.
    assert np.allclose(be.viewpoints[0].r, 2 * np.eye(3))
    assert np.allclose(be.viewpoints[0].t, 1.0)
    assert be.viewpoints[0].exposure_a == 0.5
    # Non-finite row dropped: previous pose/exposure kept.
    assert np.allclose(be.viewpoints[1].r, np.eye(3))
    assert np.allclose(be.viewpoints[1].t, 0.0)
    assert be.viewpoints[1].exposure_a == 0.1
    # Visibility recorded for both.
    assert 0 in be.occ_aware_visibility and 1 in be.occ_aware_visibility
