"""Training-step parity fixture: one optimizer step of the reference's
legacy training graph, executed in live TensorFlow.

Builds the reference UNet2D graph (``UnMicst.py:60-187``) plus its
optimization section with verbatim semantics (``UnMicst.py:268-282``:
``loss = reduce_mean(-reduce_sum(labels * log(nn), 3))``,
``MomentumOptimizer(exponential_decay(0.01, step, 1000, 0.95, staircase),
0.9)``, BN update ops via ``control_dependencies(UPDATE_OPS)``), runs ONE
step with ``training=True`` on a fixed batch from randomized weights, and
captures (initial checkpoint, batch, updated variables, loss) into
``tests/fixtures/oracle_train_legacy/``.

``tests/test_oracle_parity.py::test_train_step_matches_reference_graph``
then replays the same step through ``unmicst_tpu.train`` (optax) and pins
every updated variable — validating the CE gradient, the Momentum update,
the lr schedule, and the BN train-mode batch statistics + moving-average
updates through the whole graph.

The legacy generation is used because its training graph is deterministic
(no dropout); the v2 deltas (clipped log, weight maps, Adam, L1) share no
randomness-sensitive ops and are covered by the op-level torch oracle.

Run: python scripts/oracle_tf_train.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
FIXDIR = os.path.join(REPO, "tests", "fixtures", "oracle_train_legacy")

HP = dict(imSize=32, nChannels=1, nClasses=3, nOut0=4, featMapsFact=2,
          downSampFact=2, ks=5, nExtraConvs=1, stdDev0=0.03,
          nLayers=2, batchSize=2)


def main() -> None:
    from oracle_tf_reference import (
        install_io_stubs, load_reference_module, randomize_variables,
    )

    install_io_stubs()
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    os.environ["TF_USE_LEGACY_KERAS"] = "1"
    import tensorflow.compat.v1 as tf

    tf.disable_v2_behavior()
    tf.logging.set_verbosity(tf.logging.ERROR)

    os.makedirs(FIXDIR, exist_ok=True)
    tf.reset_default_graph()
    mod = load_reference_module("/root/reference", "UnMicst.py")
    mod.UNet2D.setupWithHP(HP)

    # the reference's optimization section, UnMicst.py:268-282
    S, K, B = HP["imSize"], HP["nClasses"], HP["batchSize"]
    tf_labels = tf.placeholder("float", shape=[None, S, S, K], name="labels")
    global_step = tf.Variable(0, trainable=False)
    lr = tf.train.exponential_decay(0.01, global_step, 1000, 0.95,
                                    staircase=True)
    loss = tf.reduce_mean(
        -tf.reduce_sum(tf.multiply(tf_labels, tf.log(mod.UNet2D.nn)), 3)
    )
    update_ops = tf.get_collection(tf.GraphKeys.UPDATE_OPS)
    optimizer = tf.train.MomentumOptimizer(lr, 0.9)
    with tf.control_dependencies(update_ops):
        opt_op = optimizer.minimize(loss, global_step=global_step)

    rng = np.random.default_rng(20260817)
    x = rng.normal(0.0, 1.0, (B, S, S, 1)).astype(np.float32)
    classes = rng.integers(0, K, (B, S, S))
    labels = np.eye(K, dtype=np.float32)[classes]

    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        randomize_variables(tf, sess, rng)
        saver = tf.train.Saver(
            [v for v in tf.global_variables()
             if "Momentum" not in v.op.name and v.op.name != "Variable"]
        )
        saver.save(sess, os.path.join(FIXDIR, "model.ckpt"),
                   write_meta_graph=False, write_state=False)
        loss0 = sess.run(loss, {mod.UNet2D.tfData: x, tf_labels: labels,
                                mod.UNet2D.tfTraining: False})
        _, loss_train = sess.run(
            [opt_op, loss],
            {mod.UNet2D.tfData: x, tf_labels: labels,
             mod.UNet2D.tfTraining: True},
        )
        updated = {
            v.op.name: sess.run(v) for v in tf.global_variables()
            if v.op.name != "Variable"  # skip the step counter
        }

    np.savez_compressed(
        os.path.join(FIXDIR, "step.npz"),
        x=x, labels=labels,
        **{f"var::{k}": v for k, v in updated.items()},
    )
    with open(os.path.join(FIXDIR, "hp.json"), "w") as f:
        json.dump({"hp": HP, "loss_eval": float(loss0),
                   "loss_train_mode": float(loss_train)}, f)
    print(f"[oracle-train] eval loss {loss0:.6f}, train-mode loss "
          f"{loss_train:.6f}, {len(updated)} updated vars -> {FIXDIR}")


if __name__ == "__main__":
    main()
