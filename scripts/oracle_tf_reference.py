"""Generate parity fixtures by EXECUTING the reference TF1 graphs.

This is the strongest oracle available without the S3 weight blobs: instead
of re-implementing the reference in a third framework, run the upstream
graph definitions themselves (``UnMicst.py:60-187``, ``UnMicst1-5.py:55-237``,
``UnMicst2.py:52-235``, ``UnMicstCyto2.py:45-231``) under
``tensorflow.compat.v1`` with randomized weights, and capture
(input, softmax output, checkpoint) triples into
``tests/fixtures/oracle_<variant>/``.  The committed fixtures make the
resulting parity tests (``tests/test_oracle_parity.py``) self-contained —
CI needs neither TensorFlow nor the reference checkout.

Randomization covers EVERY variable, including BN gamma/beta and the moving
statistics, so a wrong BN placement, wrong epsilon, wrong moving-stat use,
or a swapped activation order cannot cancel out.

Also live-validates ``core/checkpoint.save_tf1_params`` by restoring one of
our bundles with ``tf.train.Saver.restore`` into the reference graph
(``UnMicst.py:510-515`` is the upstream restore path) and asserting the
round-trip — upgrading PARITY.md's interop claim from format-verified to
TF-verified.

Usage::

    python scripts/oracle_tf_reference.py [--reference /root/reference]

Requires tensorflow 2.x (compat.v1) and the reference checkout; emits a
summary JSON to ``tests/fixtures/oracle_report.json``.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXDIR = os.path.join(REPO, "tests", "fixtures")

# The four upstream tools and the structural knobs that distinguish their
# shipped models (hp mirrors the real hp.data sidecars but narrow, so the
# committed checkpoints stay small; BN/activation placement does not depend
# on width).
SPECS = {
    # models/nucleiDAPI hp: nLayers=2, nExtraConvs=1, ks=5
    "legacy": dict(
        src="UnMicst.py",
        hp=dict(imSize=64, nChannels=1, nClasses=3, nOut0=4, featMapsFact=2,
                downSampFact=2, ks=5, nExtraConvs=1, stdDev0=0.03,
                nLayers=2, batchSize=2),
    ),
    # models/nucleiDAPI1-5 hp: nLayers=4, nExtraConvs=0, ks=3
    "v2": dict(
        src="UnMicst1-5.py",
        hp=dict(imSize=64, nChannels=1, nClasses=3, nOut0=4, featMapsFact=2,
                downSampFact=2, ks=3, nExtraConvs=0, stdDev0=0.03,
                nLayers=4, batchSize=2),
    ),
    # models/nucleiDAPILAMIN hp: nChannels=2, nLayers=5, nExtraConvs=0
    "duo": dict(
        src="UnMicst2.py",
        hp=dict(imSize=64, nChannels=2, nClasses=3, nOut0=4, featMapsFact=2,
                downSampFact=2, ks=3, nExtraConvs=0, stdDev0=0.03,
                nLayers=5, batchSize=2),
    ),
    # models/CytoplasmZeissNikon hp: nClasses=2, nLayers=3, nExtraConvs=1
    "cyto2": dict(
        src="UnMicstCyto2.py",
        hp=dict(imSize=64, nChannels=1, nClasses=2, nOut0=4, featMapsFact=2,
                downSampFact=2, ks=3, nExtraConvs=1, stdDev0=0.03,
                nLayers=3, batchSize=2),
    ),
}


def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for key, val in attrs.items():
        setattr(mod, key, val)
    sys.modules[name] = mod
    return mod


def install_io_stubs() -> None:
    """Stub the image-I/O imports the reference files pull in at module top.

    Only the graph definitions are executed; none of these I/O entry points
    are reached, so empty shims suffice.
    """
    for name in ("tifffile", "czifile"):
        if name not in sys.modules and importlib.util.find_spec(name) is None:
            _stub_module(name, imread=None, imsave=None, CziFile=None)
    if importlib.util.find_spec("nd2reader") is None:
        _stub_module("nd2reader", ND2Reader=None)
    if importlib.util.find_spec("skimage") is None:
        sk = _stub_module("skimage")
        sk.io = _stub_module("skimage.io", imread=None, imsave=None)
        sk.exposure = _stub_module(
            "skimage.exposure", rescale_intensity=None, histogram=None
        )
        sk.morphology = _stub_module("skimage.morphology")
        sk.transform = _stub_module("skimage.transform", resize=None)
    try:
        from scipy import misc  # noqa: F401  (removed in scipy>=1.12)
    except ImportError:
        _stub_module("scipy.misc", imread=None, imresize=None)
        import scipy

        scipy.misc = sys.modules["scipy.misc"]


def load_reference_module(ref_dir: str, filename: str):
    """Import one reference tool file (dash-safe) with toolbox resolvable."""
    if ref_dir not in sys.path:
        sys.path.insert(0, ref_dir)
    name = "ref_" + filename.replace("-", "_").removesuffix(".py")
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ref_dir, filename)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def randomize_variables(tf, sess, rng: np.random.Generator) -> None:
    """Assign controlled random values to EVERY graph variable.

    Kernels get fan-in-scaled normals (keeps logits unsaturated through
    ~20 conv layers so softmax differences stay observable); BN moving
    variance and gamma stay positive and away from 1 so a misplaced or
    skipped BN shows up.
    """
    for var in tf.global_variables():
        shape = tuple(var.shape.as_list())
        name = var.op.name
        if not shape:  # global step etc.
            continue
        if name.endswith(("/Momentum", "/Adam", "/Adam_1")):
            continue  # optimizer slots must stay at their zero init
        if name.endswith("moving_variance") or name.endswith("gamma"):
            val = rng.uniform(0.6, 1.6, shape)
        elif name.endswith("moving_mean") or name.endswith("beta"):
            val = rng.normal(0.0, 0.25, shape)
        elif len(shape) == 4:  # conv kernel [kh, kw, in, out]
            fan_in = shape[0] * shape[1] * shape[2]
            val = rng.normal(0.0, 1.2 / np.sqrt(fan_in), shape)
        else:
            val = rng.normal(0.0, 0.1, shape)
        sess.run(var.assign(val.astype(np.float32)))


def generate_fixture(tf, ref_dir: str, variant: str, spec: dict) -> dict:
    outdir = os.path.join(FIXDIR, f"oracle_{variant}")
    os.makedirs(outdir, exist_ok=True)
    tf.reset_default_graph()
    mod = load_reference_module(ref_dir, spec["src"])
    hp = spec["hp"]
    mod.UNet2D.setupWithHP(hp)

    rng = np.random.default_rng(20260816)
    x = rng.normal(0.0, 1.0, (hp["batchSize"], hp["imSize"], hp["imSize"],
                              hp["nChannels"])).astype(np.float32)
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        randomize_variables(tf, sess, rng)
        probs = sess.run(
            mod.UNet2D.nn,
            feed_dict={mod.UNet2D.tfData: x, mod.UNet2D.tfTraining: False},
        )
        # sanity: unsaturated output (a saturated softmax would mask errors)
        spread = float(np.std(probs))
        saver = tf.train.Saver()
        saver.save(sess, os.path.join(outdir, "model.ckpt"),
                   write_meta_graph=False, write_state=False)

    np.savez_compressed(
        os.path.join(outdir, "io.npz"), x=x, probs=probs.astype(np.float32)
    )
    with open(os.path.join(outdir, "hp.json"), "w") as f:
        json.dump(hp, f)
    n_vars = len(tf.train.list_variables(os.path.join(outdir, "model.ckpt")))
    return {
        "variant": variant, "src": spec["src"], "n_vars": n_vars,
        "prob_std": spread, "prob_minmax": [float(probs.min()), float(probs.max())],
    }


def validate_tf1_writer(tf, ref_dir: str, tmpdir: str) -> dict:
    """Write bundles with OUR writer; Saver.restore them into the REFERENCE
    graphs (both generations) and assert exact value round-trip."""
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from unmicst_tpu.core.checkpoint import save_tf1_params
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.core import unet

    results = {}
    for variant in ("legacy", "v2"):
        spec = SPECS[variant]
        hp_ref = spec["hp"]
        hp = HParams.from_ref_dict(hp_ref)
        params = unet.init_params(jax.random.PRNGKey(7), hp, variant=variant)
        prefix = os.path.join(tmpdir, f"writer_{variant}", "model.ckpt")
        os.makedirs(os.path.dirname(prefix), exist_ok=True)
        save_tf1_params(prefix, params, hp, variant)

        tf.reset_default_graph()
        mod = load_reference_module(ref_dir, spec["src"])
        mod.UNet2D.setupWithHP(hp_ref)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            saver = tf.train.Saver()  # upstream restore path, UnMicst.py:510
            saver.restore(sess, prefix)
            key = ("downsampling/ld0/kernel1" if variant == "legacy"
                   else "downsampling/ld0/kernelD0")
            restored = {v.op.name: sess.run(v) for v in tf.global_variables()}
        ours = np.asarray(params["down"][0]["kernel1"])
        exact = bool(np.array_equal(restored[key], ours))
        results[variant] = {
            "restored_vars": len(restored), "ld0_kernel_exact": exact,
        }
        if not exact:
            raise SystemExit(f"writer round-trip MISMATCH for {variant}")
    return results


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    install_io_stubs()
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    # Keras 3 removed tf.compat.v1.layers; the tf_keras shim restores it.
    os.environ["TF_USE_LEGACY_KERAS"] = "1"
    import tensorflow.compat.v1 as tf

    tf.disable_v2_behavior()
    tf.logging.set_verbosity(tf.logging.ERROR)

    report = {"tf_version": tf.__version__, "fixtures": [], "writer": None}
    for variant, spec in SPECS.items():
        info = generate_fixture(tf, args.reference, variant, spec)
        report["fixtures"].append(info)
        print(f"[oracle] {variant}: {info}")

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        report["writer"] = validate_tf1_writer(tf, args.reference, tmp)
    print(f"[oracle] writer live-TF validation: {report['writer']}")

    with open(os.path.join(FIXDIR, "oracle_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(f"[oracle] report -> {os.path.join(FIXDIR, 'oracle_report.json')}")


if __name__ == "__main__":
    main()
