"""Multi-step training-TRAJECTORY fixtures from the executed reference
training graphs (r2 verdict #2: a 1-step test cannot see accumulation
drift — lr schedule stepping, BN moving-stat compounding, optimizer slot
evolution, update order).

Two trajectories, both 50 steps on deterministic synthetic batches:

* ``legacy`` — the UnMicst.py optimization section executed live
  (``UnMicst.py:268-282``: plain CE, MomentumOptimizer(exp_decay(0.01,
  step, D, 0.95, staircase), 0.9), UPDATE_OPS control dependency) with
  ``decay_steps = 20`` so the staircase fires twice inside the window
  (the reference constant is 1000; the *mechanism* is what trajectory
  parity must pin, and both sides use the same constant).
* ``v2`` — the UnMicst1-5.py optimization section executed live
  (``UnMicst1-5.py:355-380``: weighted CE over clip(nn, 1e-7, 1-1e-7),
  + get_regularization_loss (the L1 kernel regularizers), AdamOptimizer
  on the same staircase schedule, decay_steps = 20 likewise).  Dropout
  (``UnMicst1-5.py:139``) is patched to identity before graph build —
  TF and JAX cannot share mask streams; BN still runs in training mode.

Per variant the fixture holds the INITIAL and FINAL checkpoints (both
loaded through ``core/checkpoint.load_tf1_params`` by the test, so every
variable including BN moving stats is compared with zero name plumbing),
all 50 batches, and the per-step train-mode loss curve.

Run: python scripts/oracle_tf_train_traj.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

N_STEPS = 50
DECAY_STEPS = 20  # staircase fires at steps 20 and 40

SPECS = {
    "legacy": dict(
        src="UnMicst.py",
        hp=dict(imSize=32, nChannels=1, nClasses=3, nOut0=4,
                featMapsFact=2, downSampFact=2, ks=5, nExtraConvs=1,
                stdDev0=0.03, nLayers=2, batchSize=2),
        lr0=0.01, decay_rate=0.95, optimizer="momentum",
        use_weights=False,
    ),
    "v2": dict(
        src="UnMicst1-5.py",
        hp=dict(imSize=32, nChannels=1, nClasses=3, nOut0=4,
                featMapsFact=2, downSampFact=2, ks=3, nExtraConvs=0,
                stdDev0=0.03, nLayers=3, batchSize=2),
        lr0=5e-5, decay_rate=0.98, optimizer="adam",
        use_weights=True,
    ),
}


def run_variant(tf, name: str, spec: dict) -> None:
    from oracle_tf_reference import load_reference_module, randomize_variables

    fixdir = os.path.join(REPO, "tests", "fixtures",
                          f"oracle_traj_{name}")
    os.makedirs(fixdir, exist_ok=True)
    tf.reset_default_graph()

    # dropout off: deterministic trajectory (see module docstring)
    orig_dropout = tf.layers.dropout
    tf.layers.dropout = lambda x, *a, **k: x
    try:
        mod = load_reference_module("/root/reference", spec["src"])
        mod.UNet2D.setupWithHP(dict(spec["hp"]))
    finally:
        tf.layers.dropout = orig_dropout

    hp = spec["hp"]
    S, K, B = hp["imSize"], hp["nClasses"], hp["batchSize"]
    tf_labels = tf.placeholder("float", shape=[None, S, S, K], name="labels")
    tf_weights = tf.placeholder("float", shape=[None, S, S, K], name="weights")
    global_step = tf.Variable(0, trainable=False)
    lr = tf.train.exponential_decay(spec["lr0"], global_step, DECAY_STEPS,
                                    spec["decay_rate"], staircase=True)
    if spec["use_weights"]:
        # UnMicst1-5.py:367-373
        reg = tf.losses.get_regularization_loss()
        log_p = tf.log(tf.clip_by_value(mod.UNet2D.nn, 1e-7, 1 - 1e-7))
        loss = tf.reduce_mean(
            -tf.reduce_sum(tf_weights * tf_labels * log_p, 3)
        ) + reg
    else:
        # UnMicst.py:268-271
        loss = tf.reduce_mean(
            -tf.reduce_sum(tf_labels * tf.log(mod.UNet2D.nn), 3)
        )
    update_ops = tf.get_collection(tf.GraphKeys.UPDATE_OPS)
    if spec["optimizer"] == "momentum":
        optimizer = tf.train.MomentumOptimizer(lr, 0.9)
    else:
        optimizer = tf.train.AdamOptimizer(learning_rate=lr)
    with tf.control_dependencies(update_ops):
        opt_op = optimizer.minimize(loss, global_step=global_step)

    rng = np.random.default_rng(20260817)
    xs = rng.normal(0.0, 1.0, (N_STEPS, B, S, S, hp["nChannels"]))
    xs = xs.astype(np.float32)
    classes = rng.integers(0, K, (N_STEPS, B, S, S))
    labels = np.eye(K, dtype=np.float32)[classes]
    weights = (1.0 + rng.random((N_STEPS, B, S, S, 1))).astype(np.float32)
    weights = np.broadcast_to(weights, labels.shape).copy()

    slot_free = [
        v for v in tf.global_variables()
        if "Momentum" not in v.op.name and "Adam" not in v.op.name
        and "beta1_power" not in v.op.name and "beta2_power" not in v.op.name
        and v.op.name != "Variable"
    ]
    losses = np.zeros(N_STEPS, np.float64)
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        randomize_variables(tf, sess, rng)
        saver = tf.train.Saver(slot_free, max_to_keep=4)
        saver.save(sess, os.path.join(fixdir, "init.ckpt"),
                   write_meta_graph=False, write_state=False)
        for t in range(N_STEPS):
            feed = {mod.UNet2D.tfData: xs[t], tf_labels: labels[t],
                    mod.UNet2D.tfTraining: True}
            if spec["use_weights"]:
                feed[tf_weights] = weights[t]
            _, losses[t] = sess.run([opt_op, loss], feed)
        saver.save(sess, os.path.join(fixdir, "final.ckpt"),
                   write_meta_graph=False, write_state=False)
        lr_final = float(sess.run(lr))

    np.savez_compressed(
        os.path.join(fixdir, "traj.npz"),
        x=xs, labels=labels, weights=weights, losses=losses,
    )
    with open(os.path.join(fixdir, "meta.json"), "w") as f:
        json.dump({
            "hp": hp, "n_steps": N_STEPS, "decay_steps": DECAY_STEPS,
            "lr0": spec["lr0"], "decay_rate": spec["decay_rate"],
            "optimizer": spec["optimizer"],
            "use_weights": spec["use_weights"],
            "loss_first": losses[0], "loss_last": losses[-1],
            "lr_final": lr_final,
            "note": "dropout patched to identity; decay_steps shrunk so "
                    "the staircase fires at steps 20 and 40",
        }, f, indent=1)
    print(f"[oracle-traj-{name}] loss {losses[0]:.4f} -> {losses[-1]:.4f}, "
          f"final lr {lr_final:.3e} -> {fixdir}")


def main() -> None:
    from oracle_tf_reference import install_io_stubs

    install_io_stubs()
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    os.environ["TF_USE_LEGACY_KERAS"] = "1"
    import tensorflow.compat.v1 as tf

    tf.disable_v2_behavior()
    tf.logging.set_verbosity(tf.logging.ERROR)
    for name, spec in SPECS.items():
        run_variant(tf, name, spec)


if __name__ == "__main__":
    main()
