"""Does bf16 mixed-precision training CONVERGE like f32?  (real chip)

The throughput table (BASELINE.md) shows the bf16 path is ~2x f32-HIGH;
this validates the other half of the claim: same corpus, same seeds,
same step count as the convergence bake-off — f32-parity vs
``compute_dtype="bfloat16"`` — the validation-error plateaus must agree.

Run: python - < scripts/mixed_precision_convergence_tpu.py
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from unmicst_tpu.utils.compcache import enable as _enable_cache

_enable_cache()

import convergence_bakeoff as cb

N_STEPS = 300


def run(cfg_kw, root, tag):
    import jax

    from unmicst_tpu.core import unet
    from unmicst_tpu.core.hp import HParams
    from unmicst_tpu.train import Corpus, TrainConfig, Trainer

    hp = HParams.from_ref_dict(dict(cb.HP))
    cfg = TrainConfig.for_variant("v2", n_aug=cb.N_AUG, seed=0,
                                  export_tf1=False, **cfg_kw)
    params = unet.init_params(jax.random.PRNGKey(0), hp, "v2")
    log = os.path.join(root, f"run_{tag}")
    trainer = Trainer(hp, cfg, model_path=log, log_path=log, params=params)
    train_c = Corpus(os.path.join(root, "train"), cb.N_TRAIN, hp, cfg)
    valid_c = Corpus(os.path.join(root, "valid"), cb.N_VALID, hp, cfg)
    trainer.fit(train_c, valid_c, N_STEPS, verbose=False)
    curve = []
    with open(os.path.join(log, "metrics.jsonl")) as f:
        for line in f:
            curve.append(json.loads(line)["valid_error"])
    return np.asarray(curve[:N_STEPS])


def main() -> None:
    import jax

    root = tempfile.mkdtemp(prefix="mpconv_")
    rng = np.random.RandomState(7)
    for split, n in (("train", cb.N_TRAIN), ("valid", cb.N_VALID)):
        cb.write_corpus(os.path.join(root, split), n, rng)

    f32 = run({}, root, "f32")
    bf16 = run({"compute_dtype": "bfloat16"}, root, "bf16")
    plateau = lambda c: float(np.mean(c[-40:]))
    report = {
        "device": str(jax.devices()[0]), "n_steps": N_STEPS,
        "f32": {"start_e": float(np.mean(f32[:5])),
                "plateau_e": plateau(f32)},
        "bf16_mixed": {"start_e": float(np.mean(bf16[:5])),
                       "plateau_e": plateau(bf16)},
        "plateau_abs_diff": abs(plateau(f32) - plateau(bf16)),
    }
    with open("/root/repo/scripts/mixed_precision_convergence_report.json",
              "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
