"""Convergence-shape bake-off: the reference's ACTUAL ``train()`` vs our
Trainer, same synthetic corpus, matched config (r2 verdict #10).

The reference's v2 training entry point (``UnMicst1-5.py:240-579``) is
executed live under TF 2.x compat.v1 — corpus loading, augmentation
picks, brightness/contrast jitter, per-class weight maps, Adam +
exp-decay, BN train mode, the full loop — on a LEARNABLE synthetic
nuclei corpus written in its own on-disk layout (multi-page
``I%05d_Img.tif``, ``I%05d_Ant.tif`` in 1..3, ``I%05d_wt.tif``).  Our
``Trainer.fit`` runs on the same files with the matched
``TrainConfig.for_variant("v2")``.  RNG streams necessarily differ
(augmentation draw order, dropout masks), so the comparison is
convergence SHAPE, not bit parity: both validation-error curves must
fall, and their converged plateaus must agree within tolerance.

Emits ``scripts/convergence_bakeoff_report.json`` (asserted by
``tests/test_train.py::test_convergence_bakeoff_report``) and
``docs/images/convergence_bakeoff.png``.

Run: python scripts/convergence_bakeoff.py   (~5-10 min, 1-core CPU)
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

N_STEPS = int(os.environ.get("BAKEOFF_STEPS", "300"))
# N_VALID == batchSize: every validation step sees the SAME full valid
# set on both legs (the reference cycles 4-sample windows; equal sizes
# collapse the window lottery), so the curves differ only by aug-page
# draw, not by which samples were scored
N_TRAIN, N_VALID, N_TEST = 16, 4, 4
S = 32
N_AUG = 12
HP = dict(imSize=S, nChannels=1, nClasses=3, nOut0=8, featMapsFact=2,
          downSampFact=2, ks=3, nExtraConvs=0, stdDev0=0.03,
          nLayers=3, batchSize=4)


# ---------------------------------------------------------------------------
# learnable synthetic nuclei corpus, reference on-disk layout
# ---------------------------------------------------------------------------


def make_sample(rng: np.random.RandomState):
    img = rng.normal(0.25, 0.03, (S, S))
    ant = np.ones((S, S), np.uint8)
    yy, xx = np.mgrid[0:S, 0:S]
    for _ in range(rng.randint(2, 4)):
        r = rng.randint(4, 7)
        cy = rng.randint(r, S - r)
        cx = rng.randint(r, S - r)
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        inner = d2 <= (r - 1.5) ** 2
        ring = (d2 <= r * r) & ~inner
        img[inner] += 0.35
        img[ring] += 0.15
        ant[inner] = 3
        ant[ring] = 2
    wt = ((ant == 2) & (rng.rand(S, S) < 0.2)).astype(np.uint8)
    img = np.clip(img + rng.normal(0, 0.02, (S, S)), 0, 1)
    return (img * 65535).astype(np.uint16), ant, wt


def _aug_pages(img: np.ndarray):
    """12 deterministic dihedral-ish variants (the corpus format bakes
    augmentations in as pages; UnMicst1-5.py:295-301)."""
    pages = []
    for k in range(4):
        pages.append(np.rot90(img, k))
        pages.append(np.rot90(img[::-1], k))
    pages.extend(pages[:N_AUG - len(pages)])
    return [np.ascontiguousarray(p) for p in pages[:N_AUG]]


def write_corpus(path: str, n: int, rng: np.random.RandomState) -> None:
    from unmicst_tpu.io.tiff import TiffWriter

    os.makedirs(path, exist_ok=True)
    for i in range(n):
        img, ant, wt = make_sample(rng)
        with TiffWriter(os.path.join(path, f"I{i:05d}_Img.tif"),
                        bigtiff=False) as tw:
            for page in _aug_pages(img):
                tw.write(page)
        with TiffWriter(os.path.join(path, f"I{i:05d}_Ant.tif"),
                        bigtiff=False) as tw:
            tw.write(ant)
        with TiffWriter(os.path.join(path, f"I{i:05d}_wt.tif"),
                        bigtiff=False) as tw:
            tw.write(wt)


# ---------------------------------------------------------------------------
# reference leg: execute UnMicst1-5.py train() with functional IO shims
# ---------------------------------------------------------------------------


def _install_functional_io() -> None:
    """The graph-oracle stubs are inert; train() really reads files.
    Back tifffile/skimage.io with our own TIFF codec."""
    from unmicst_tpu.io import tiff as utiff

    tiffmod = types.ModuleType("tifffile")
    tiffmod.imread = lambda p: utiff.imread(p, 0)
    tiffmod.imsave = lambda p, a: utiff.imwrite(p, np.asarray(a))
    sys.modules["tifffile"] = tiffmod

    skio = types.ModuleType("skimage.io")
    skio.imread = lambda p, img_num=0, **kw: utiff.imread(p, img_num)
    skio.imsave = lambda p, a, **kw: utiff.imwrite(p, np.asarray(a))
    sk = sys.modules.get("skimage") or types.ModuleType("skimage")
    sk.io = skio
    sys.modules["skimage"] = sk
    sys.modules["skimage.io"] = skio


def _seed_reference_checkpoint(tf, mod, seed_prefix: str,
                               model_dir: str) -> None:
    """Build the reference graph + its optimizer, restore OUR initial
    weights into the model variables (live ``Saver.restore`` of our
    ``save_tf1_params`` bundle — the interop path the writer oracle
    validates), zero the Adam slots, and save a FULL checkpoint that
    ``train(restoreVariables=True)`` can resume — so both legs start
    from bit-identical weights and the comparison is convergence shape,
    not init lottery."""
    tf.reset_default_graph()
    mod.UNet2D.setupWithHP(dict(HP))
    # replicate train()'s optimization section to materialize the Adam
    # slot variables with their in-graph names (UnMicst1-5.py:355-380)
    S, K = HP["imSize"], HP["nClasses"]
    tf_labels = tf.placeholder("float", [None, S, S, K], name="labels")
    tf_weights = tf.placeholder("float", [None, S, S, K], name="weights")
    global_step = tf.Variable(0, trainable=False)
    lr = tf.train.exponential_decay(5e-5, global_step, 5000, 0.98,
                                    staircase=True)
    # the name_scope matters: Adam's slot/beta-power variables created
    # inside it carry its prefix, and train()'s full-graph Saver.restore
    # resolves them BY NAME from the checkpoint written here
    with tf.name_scope("optim"):
        reg = tf.losses.get_regularization_loss()
        log_p = tf.log(tf.clip_by_value(mod.UNet2D.nn, 1e-7, 1 - 1e-7))
        loss = tf.reduce_mean(
            -tf.reduce_sum(tf_weights * tf_labels * log_p, 3)
        ) + reg
        optimizer = tf.train.AdamOptimizer(learning_rate=lr)
        with tf.control_dependencies(
            tf.get_collection(tf.GraphKeys.UPDATE_OPS)
        ):
            optimizer.minimize(loss, global_step=global_step)
    model_vars = [
        v for v in tf.global_variables()
        if "Adam" not in v.op.name and "beta1_power" not in v.op.name
        and "beta2_power" not in v.op.name and v.op.name != "Variable"
    ]
    os.makedirs(model_dir, exist_ok=True)
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        tf.train.Saver(model_vars).restore(sess, seed_prefix)
        tf.train.Saver().save(sess, os.path.join(model_dir, "model.ckpt"),
                              write_meta_graph=False, write_state=False)


def run_reference(corpus_root: str, workdir: str, seed_prefix: str):
    from oracle_tf_reference import install_io_stubs, load_reference_module

    install_io_stubs()
    _install_functional_io()
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    os.environ["TF_USE_LEGACY_KERAS"] = "1"
    import tensorflow.compat.v1 as tf

    tf.disable_v2_behavior()
    tf.logging.set_verbosity(tf.logging.ERROR)
    np.random.seed(0)
    tf.set_random_seed(0)
    mod = load_reference_module("/root/reference", "UnMicst1-5.py")
    _seed_reference_checkpoint(tf, mod, seed_prefix,
                               os.path.join(workdir, "model"))
    tf.reset_default_graph()
    np.random.seed(0)
    tf.set_random_seed(0)
    mod.UNet2D.setupWithHP(dict(HP))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        mod.UNet2D.train(
            os.path.join(corpus_root, "train"),
            os.path.join(corpus_root, "valid"),
            os.path.join(corpus_root, "test"),
            os.path.join(workdir, "log"),
            os.path.join(workdir, "model"),
            os.path.join(workdir, "pm"),
            N_TRAIN, N_VALID, N_TEST,
            True, N_STEPS, 0, 1,  # restoreVariables=True: our seed weights
        )
    curve = [
        float(m.group(1))
        for m in re.finditer(r"step \d+, e: ([\d.]+)", buf.getvalue())
    ]
    assert len(curve) == N_STEPS, (len(curve), buf.getvalue()[-2000:])
    return curve


# ---------------------------------------------------------------------------
# our leg
# ---------------------------------------------------------------------------


def run_ours(corpus_root: str, workdir: str):
    """Our leg; also writes the shared-seed TF1 bundle both legs start
    from.  Returns (curve, seed_ckpt_prefix)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from unmicst_tpu.core import unet
    from unmicst_tpu.core.checkpoint import save_tf1_params
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.train import Corpus, TrainConfig, Trainer

    hp = HParams.from_ref_dict(dict(HP))
    cfg = TrainConfig.for_variant("v2", n_aug=N_AUG, seed=0,
                                  export_tf1=False)
    init_params = unet.init_params(jax.random.PRNGKey(0), hp, "v2")
    seed_prefix = os.path.join(workdir, "seed.ckpt")
    import numpy as _np

    host = jax.tree_util.tree_map(_np.asarray, init_params)
    save_tf1_params(seed_prefix, host, hp, "v2")
    log = os.path.join(workdir, "ours")
    trainer = Trainer(hp, cfg, model_path=log, log_path=log,
                      params=init_params)
    train_c = Corpus(os.path.join(corpus_root, "train"), N_TRAIN, hp, cfg)
    valid_c = Corpus(os.path.join(corpus_root, "valid"), N_VALID, hp, cfg)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        trainer.fit(train_c, valid_c, N_STEPS)
    curve = []
    with open(os.path.join(log, "metrics.jsonl")) as f:
        for line in f:
            curve.append(json.loads(line)["valid_error"])
    assert len(curve) >= N_STEPS
    return curve[:N_STEPS], seed_prefix


def main() -> None:
    root = tempfile.mkdtemp(prefix="bakeoff_")
    rng = np.random.RandomState(7)
    for split, n in (("train", N_TRAIN), ("valid", N_VALID),
                     ("test", N_TEST)):
        write_corpus(os.path.join(root, split), n, rng)

    ours, seed_prefix = run_ours(root, root)
    theirs = run_reference(root, root, seed_prefix)

    def plateau(c):
        return float(np.mean(c[-40:]))

    def start(c):
        return float(np.mean(c[:5]))

    report = {
        "n_steps": N_STEPS, "hp": HP,
        "corpus": f"{N_TRAIN}/{N_VALID}/{N_TEST} synthetic nuclei "
                  f"({S}x{S}, {N_AUG} baked augmentations)",
        "reference": {"start_e": start(theirs),
                      "plateau_e": plateau(theirs)},
        "ours": {"start_e": start(ours), "plateau_e": plateau(ours)},
        "plateau_abs_diff": abs(plateau(ours) - plateau(theirs)),
        "curves": {"reference": theirs, "ours": ours},
    }
    with open(os.path.join(REPO, "scripts",
                           "convergence_bakeoff_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "curves"}))

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        ax.plot(theirs, label="reference train() (live TF)", alpha=0.8)
        ax.plot(ours, label="unmicst_tpu Trainer", alpha=0.8)
        ax.set_xlabel("step")
        ax.set_ylabel("validation mean per-class error")
        ax.set_title("Convergence bake-off (matched config, shared corpus)")
        ax.legend()
        fig.tight_layout()
        os.makedirs(os.path.join(REPO, "docs", "images"), exist_ok=True)
        fig.savefig(os.path.join(REPO, "docs", "images",
                                 "convergence_bakeoff.png"), dpi=110)
    except ImportError:
        pass


if __name__ == "__main__":
    main()
