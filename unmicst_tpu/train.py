"""Training subsystem: weighted-CE UNet training with optax.

Behavioral spec: ``UNet2D.train`` — legacy flavor ``UnMicst.py:189-415``
(plain CE, Momentum 0.9, lr0=0.01 exp-decay 1000/0.95) and v2 flavor
``UnMicst1-5.py:240-579`` (per-class weight maps, Adam lr0=5e-5 exp-decay
5000/0.98, nAug=12 pre-rendered augmentation pages per sample,
brightness/contrast jitter, validation every step, best-on-valid
checkpoint every 50 steps).

TPU-first redesign:

* pure jitted ``train_step``/``eval_step`` over a params pytree; BN
  moving-stat updates flow functionally (replacing TF UPDATE_OPS control
  deps, ``UnMicst1-5.py:375-380``);
* data/tensor parallelism by construction: steps are ``jax.jit`` over a
  ``Mesh`` with batch sharded on ``data`` and wide kernels on ``model``
  (see :mod:`unmicst_tpu.runtime.mesh`) — the gradient ``psum`` over ICI is
  inserted by XLA;
* checkpoints: native msgpack + reference-compatible pickled sidecars, so a
  trained model dir is drop-in for the zoo loader.
"""

from __future__ import annotations

import dataclasses
import json
import os
import queue as _queue_mod
import threading
import time
from functools import partial
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unmicst_tpu.core import unet
from unmicst_tpu.core.hp import HParams, save_pickle
from unmicst_tpu.core.unet import Params

EPS = 1e-7  # log clip (UnMicst1-5.py:369-370)

# class-weight constants (UnMicst1-5.py:278-281)
# v2 defaults (UnMicst1-5.py:278-281); duo/cyto2 override via TrainConfig
BG_WEIGHT = 1.0
CONTOUR_WEIGHT = 2.0
NUCLEI_WEIGHT = 7.0
INTERSECT_WEIGHT = 15.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Per-variant optimization hyper-parameters (reference values)."""

    variant: str = "v2"
    lr0: float = 5e-5  # UnMicst1-5.py:362
    decay_steps: int = 5000
    decay_rate: float = 0.98
    optimizer: str = "adam"  # 'adam' | 'momentum'
    momentum: float = 0.9
    n_aug: int = 12  # UnMicst1-5.py:258
    use_weights: bool = True
    dataset_mean: float = 0.34  # UnMicst1-5.py:276-277
    dataset_std: float = 0.25
    ckpt_every: int = 50  # UnMicst1-5.py:519
    seed: int = 0
    remat: bool = False  # jax.checkpoint the forward (HBM <- -> FLOPs trade)
    # MXU pass count for the fwd/bwd convs: 'high' (3-pass f32 emulation)
    # is gradient-accurate to ~1e-6 relative at ~2x the throughput of
    # 'highest'; see BASELINE.md precision table
    precision: str = "high"
    # Mixed-precision training (TPU fast path, opt-in): 'bfloat16' runs
    # the fwd/bwd convolutions in bf16 with f32 accumulation while
    # master weights, BN statistics, CE/softmax, and optimizer state
    # stay f32 — the standard TPU recipe.  None (default) keeps the
    # reference-parity f32 pipeline.
    compute_dtype: Optional[str] = None
    export_tf1: bool = True  # also write a Saver-compatible model.ckpt.*
    # brightness/contrast jitter on TRAIN batches; the duo/cyto2 corpora
    # have no baked augmentation pages yet still jitter every batch
    # (UnMicst2.py:447-450, UnMicstCyto2.py:448-449)
    jitter: bool = True
    # channels filled from the corpus; the duo reference loads ONLY
    # channel 0 and leaves channel 1 zero (UnMicst2.py:256,295-297)
    fill_channels: Optional[int] = None
    # legacy draws a FRESH permutation every step and takes its head
    # (UnMicst.py:346-352) instead of the v2 cursor walk
    per_step_shuffle: bool = False
    # Async checkpoint writes (opt-in).  save() snapshots params and
    # opt_state with one cheap on-device copy (the donated buffers
    # cannot be referenced past the next step) and a worker thread does
    # the D2H pull + msgpack/TF1 serialization while training continues.
    # Writes stay ordered (each save joins the previous); fit()/close()
    # join before returning, and a worker failure re-raises there.
    async_save: bool = False
    # TensorBoard image panels on the scalar cadence (reference
    # 'images' summaries): v2/duo write 'impm' = [min-max-normalized
    # input ch0 | PM plane 1 | PM plane 2] side by side, max 4 samples
    # (UnMicst1-5.py:409-427, UnMicst2.py:401-417); cyto2 'impm' =
    # [norm input | PM plane 0] (UnMicstCyto2.py:394-402); legacy
    # writes the PM planes as separate pm0/pm1/pm2 tags, max 3
    # (UnMicst.py:305-314).  Panels render the deterministic
    # (inference-mode) forward of the logged batch.
    tb_images: bool = True
    # Host-feed pipeline depth.  0 (default) = the inline reference
    # scheduling (assemble -> upload -> step, serialized).  N>0 runs
    # batch assembly + host->device transfer for the next N steps in a
    # background thread while the device executes the current step —
    # the standard TPU input-pipelining recipe.  Bit-identical data in
    # the identical order (the thread consumes the same shared-RNG
    # iterators), so results match the inline feed exactly; only the
    # wall changes.  Pays off whenever the host feed is comparable to
    # the device step (always true for this workload's ~4 MB/step on a
    # slow link; see BASELINE.md "training end-to-end wall").
    prefetch: int = 0
    # Validation cadence.  1 (default) = the reference protocol: one
    # valid batch + host-synced error after EVERY train step
    # (UnMicst1-5.py:498-517).  N>1 validates every Nth step (and the
    # last), buffering the train metrics as device scalars in between so
    # non-validated steps run with ZERO host syncs — XLA pipelines them
    # back-to-back.  On a host-fed link the valid batch upload + sync is
    # the dominant per-step cost once the device step is ~20 ms
    # (BASELINE.md "training end-to-end wall"), so this is the main
    # training-wall lever.  Checkpoint-on-best still only fires on
    # validated steps that hit ckpt_every, identical to the reference
    # gate when valid_every == 1.  TensorBoard train scalars drain from
    # the buffer at their own (every-20th) steps, so the train curve
    # keeps full resolution; valid scalars/panels only exist on
    # validated steps.
    valid_every: int = 1
    # class-weight constants (v2 defaults; duo 1/2/5/10, cyto2 1/3/-/5 —
    # each tool hardcodes its own set)
    bg_weight: float = BG_WEIGHT
    contour_weight: float = CONTOUR_WEIGHT
    nuclei_weight: float = NUCLEI_WEIGHT
    intersect_weight: float = INTERSECT_WEIGHT

    @classmethod
    def for_variant(cls, variant: str, **overrides) -> "TrainConfig":
        presets = {
            # UnMicst.py:270-279,346-352,378
            "legacy": dict(
                lr0=0.01, decay_steps=1000, decay_rate=0.95,
                optimizer="momentum", n_aug=1, use_weights=False,
                ckpt_every=100, per_step_shuffle=True,
            ),
            "v2": dict(lr0=5e-5),  # UnMicst1-5.py:362-365,519
            # UnMicst2.py:357-359 (6e-5, 4000, 0.99), :488 (i%10),
            # :273-278 (mean .19/.17, weights 1/2/5/10), :295-297
            # single-page corpus, channel 0 only
            "duo": dict(lr0=6e-5, decay_steps=4000, decay_rate=0.99,
                        ckpt_every=10, n_aug=1, fill_channels=1,
                        dataset_mean=0.19, dataset_std=0.17,
                        nuclei_weight=5.0, intersect_weight=10.0),
            # UnMicstCyto2.py:347-349 (1e-3, 2500, 0.97), :488 (i%10),
            # :270-274 (mean .07/.07, weights 1/3/5), :291 single-page
            "cyto2": dict(lr0=1e-3, decay_steps=2500, decay_rate=0.97,
                          ckpt_every=10, n_aug=1,
                          dataset_mean=0.07, dataset_std=0.07,
                          contour_weight=3.0, intersect_weight=5.0),
        }
        kw = dict(presets[variant])
        kw["variant"] = variant
        kw.update(overrides)
        return cls(**kw)


def class_weight_maps(labels_onehot: np.ndarray, wt: np.ndarray,
                      cfg: Optional["TrainConfig"] = None) -> np.ndarray:
    """Per-class weight planes from the ``I%05d_wt.tif`` mask.

    3-class (v2/duo, ``UnMicst1-5.py:305-312`` / ``UnMicst2.py:300-308``):
    bg=bgW, contours=wt*intersectW+contourW, nuclei=nucleiW.  2-class
    (cyto2, ``UnMicstCyto2.py:297-302``): class0=wt*intersectW+contourW,
    class1=wt*intersectW+bgW — the wt mask rides BOTH planes there."""
    bg = cfg.bg_weight if cfg else BG_WEIGHT
    contour = cfg.contour_weight if cfg else CONTOUR_WEIGHT
    nuclei = cfg.nuclei_weight if cfg else NUCLEI_WEIGHT
    intersect = cfg.intersect_weight if cfg else INTERSECT_WEIGHT
    n_classes = labels_onehot.shape[-1]
    w = np.zeros_like(labels_onehot, dtype=np.float32)
    if n_classes == 2:
        w[..., 0] = wt * intersect + contour
        w[..., 1] = wt * intersect + bg
        return w
    for i in range(n_classes):
        if i == 1:
            w[..., i] = wt * intersect + contour
        elif i == 2:
            w[..., i] = nuclei
        else:
            w[..., i] = bg
    return w


def compute_dataset_stats(im_path: str, n_samples: int) -> tuple:
    """Legacy mean/std: average of per-image im2double mean/std over the
    whole corpus (``UnMicst.py:222-231``; train+valid+test share one
    directory there)."""
    from unmicst_tpu.io import preprocess as pp
    from unmicst_tpu.io.tiff import imread

    mean = std = 0.0
    for i in range(n_samples):
        im = pp.im2double(imread(os.path.join(im_path, f"I{i:05d}_Img.tif")))
        mean += float(np.mean(im))
        std += float(np.std(im))
    return mean / n_samples, std / n_samples


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        cfg.lr0, cfg.decay_steps, cfg.decay_rate, staircase=True
    )
    if cfg.optimizer == "momentum":
        return optax.sgd(schedule, momentum=cfg.momentum)
    return optax.adam(schedule)


def loss_fn(
    params: Params,
    batch: Dict[str, jnp.ndarray],
    hp: HParams,
    cfg: TrainConfig,
    rng: jax.Array,
) -> Tuple[jnp.ndarray, Tuple[Params, Dict[str, jnp.ndarray]]]:
    """Weighted softmax CE + kernel regularization (``UnMicst1-5.py:367-373``)."""
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None

    def _fwd(p, x, r):
        return unet.apply(p, x, hp, cfg.variant, train=True, rng=r,
                          precision=cfg.precision, compute_dtype=cdt)

    fwd = jax.checkpoint(_fwd) if cfg.remat else _fwd
    probs, new_params = fwd(params, batch["image"], rng)
    log_p = jnp.log(jnp.clip(probs, EPS, 1 - EPS))
    ce = batch["labels"] * log_p
    if cfg.use_weights:
        ce = batch["weights"] * ce
    data_loss = jnp.mean(-jnp.sum(ce, axis=3))
    reg = unet.regularization_loss(params, cfg.variant)
    loss = data_loss + reg
    return loss, (new_params, {"loss": loss, "ce": data_loss, "reg": reg})


def per_class_error(
    probs: jnp.ndarray, labels_onehot: jnp.ndarray
) -> jnp.ndarray:
    """1 - (correct / labeled) per class (``UnMicst1-5.py:386-397``)."""
    pred = jnp.argmax(probs, axis=3)
    n_classes = labels_onehot.shape[-1]
    pred_onehot = jax.nn.one_hot(pred, n_classes)
    n_correct = jnp.sum(labels_onehot * pred_onehot, axis=(0, 1, 2))
    n_labeled = jnp.sum(labels_onehot, axis=(0, 1, 2))
    return 1.0 - n_correct / jnp.maximum(n_labeled, 1.0)


def make_train_step(hp: HParams, cfg: TrainConfig, tx, donate: bool = True):
    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def train_step(params, opt_state, batch, rng):
        (loss, (new_params, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch, hp, cfg, rng)
        updates, opt_state = tx.update(grads, opt_state, new_params)
        params = optax.apply_updates(new_params, updates)
        return params, opt_state, metrics

    return train_step


def make_eval_step(hp: HParams, cfg: TrainConfig):
    @jax.jit
    def eval_step(params, batch):
        probs = unet.apply(params, batch["image"], hp, cfg.variant,
                           precision=cfg.precision)
        errors = per_class_error(probs, batch["labels"])
        return {"errors": errors, "mean_error": jnp.mean(errors)}

    return eval_step


def make_panel_fn(hp: HParams, cfg: TrainConfig):
    """TensorBoard image panels per reference layout (see
    :attr:`TrainConfig.tb_images`): returns ``run(params, images) ->
    {tag: float32 [B', S, W, 1] in [0, 1]}`` with ``B'`` capped at the
    reference ``max_outputs`` (4 for v2/duo/cyto2 'impm', 3 for the
    legacy per-plane tags)."""
    max_out = 3 if cfg.variant == "legacy" else 4

    @jax.jit
    def panel(params, images):
        probs = unet.apply(params, images, hp, cfg.variant,
                           precision=cfg.precision)
        if cfg.variant == "legacy":
            # UnMicst.py:305-314: raw PM planes, separate tags
            return {
                f"pm{k}": probs[..., k:k + 1]
                for k in range(min(hp.n_classes, 3))
            }
        ch0 = images[..., 0:1]
        lo = jnp.min(ch0, axis=(1, 2), keepdims=True)
        hi = jnp.max(ch0, axis=(1, 2), keepdims=True)
        norm = (ch0 - lo) / jnp.maximum(hi - lo, EPS)
        if cfg.variant == "cyto2":
            planes = [norm, probs[..., 0:1]]  # UnMicstCyto2.py:394-401
        else:  # UnMicst1-5.py:409-427 / UnMicst2.py:401-417
            planes = [norm, probs[..., 1:2], probs[..., 2:3]]
        return {"impm": jnp.concatenate(planes, axis=2)}

    def run(params, images):
        out = panel(params, jnp.asarray(images[:max_out]))
        return {k: np.asarray(v, np.float32) for k, v in out.items()}

    return run


# ---------------------------------------------------------------------------
# corpus
# ---------------------------------------------------------------------------


class Corpus:
    """Reference-format training corpus, fully resident (like the reference).

    Layout (``UnMicst1-5.py:295-312``): ``I%05d_Img.tif`` with
    ``nAug * nChannels`` pages (page = iAug + nAug*iChan), ``I%05d_Ant.tif``
    single-page labels valued 1..nClasses, ``I%05d_wt.tif`` contour/nuclei
    intersection mask.  Legacy corpora (``UnMicst.py:236-243``) are
    single-page, no weights.
    """

    def __init__(
        self,
        path: str,
        n_samples: int,
        hp: HParams,
        cfg: TrainConfig,
        indices: Optional[np.ndarray] = None,
    ):
        from unmicst_tpu.io import preprocess as pp
        from unmicst_tpu.io.tiff import imread

        S, C, K, A = hp.im_size, hp.n_channels, hp.n_classes, cfg.n_aug
        ids = indices if indices is not None else np.arange(n_samples)
        n = len(ids)
        self.images = np.zeros((n, S, S, A, C), np.float32)
        self.labels = np.zeros((n, S, S, K), np.float32)
        self.weights = np.ones((n, S, S, K), np.float32)
        fill_c = C if cfg.fill_channels is None else min(C, cfg.fill_channels)
        for row, idx in enumerate(ids):
            img_path = os.path.join(path, f"I{idx:05d}_Img.tif")
            for c in range(fill_c):
                for a in range(A):
                    # page = iAug + nAug*iChan (UnMicst1-5.py:299); for the
                    # legacy/duo/cyto single-page corpus this is page 0
                    im = pp.im2double(imread(img_path, a + A * c))
                    self.images[row, :, :, a, c] = (
                        im - cfg.dataset_mean
                    ) / cfg.dataset_std
            # channels >= fill_c stay zero (duo parity, UnMicst2.py:256)
            ant = imread(os.path.join(path, f"I{idx:05d}_Ant.tif"))
            for k in range(K):
                self.labels[row, :, :, k] = ant == k + 1
            if cfg.use_weights:
                wt_path = os.path.join(path, f"I{idx:05d}_wt.tif")
                wt = imread(wt_path).astype(np.float32) if os.path.exists(wt_path) else np.zeros((S, S), np.float32)
                self.weights[row] = class_weight_maps(
                    self.labels[row], wt, cfg
                )
        self.n = n
        self.cfg = cfg

    def batches(
        self, batch_size: int, rng: np.random.RandomState, augment: bool,
        jitter: Optional[bool] = None,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Cursor-walk batch assembly with epoch reshuffle
        (``UnMicst1-5.py:469-489``) and brightness/contrast jitter
        (``:473-477``).  ``augment`` draws a random baked-augmentation
        page per sample; ``jitter`` (default: follow ``augment``) adds
        the brightness/contrast perturbation — the reference's
        VALIDATION draws random pages WITHOUT jitter
        (``UnMicst1-5.py:498-505``), so pass ``jitter=False`` there."""
        cfg = self.cfg
        if jitter is None:
            jitter = augment
        max_brig = 1.0 * cfg.dataset_std  # UnMicst1-5.py:464-465
        max_cont = 0.1 * cfg.dataset_std
        perm = rng.permutation(self.n)
        cursor = 0
        while True:
            if cfg.per_step_shuffle:
                # legacy protocol: fresh permutation each step, head batch
                # (UnMicst.py:346-352) — i.i.d. without-replacement draws
                perm = rng.permutation(self.n)
                take = [perm[j % self.n] for j in range(batch_size)]
            else:
                # v2 cursor walk; the reference resets when the NEXT start
                # would exceed nTrain - batchSize - 1, skipping the final
                # exact-fit batch of each epoch (UnMicst1-5.py:485-488)
                if cursor + batch_size > self.n - 1:
                    perm = rng.permutation(self.n)
                    cursor = 0
                take = [perm[(cursor + j) % self.n] for j in range(batch_size)]
                cursor += batch_size
            n_aug = self.images.shape[3]
            imgs = np.empty(
                (batch_size,) + self.images.shape[1:3] + (self.images.shape[4],),
                np.float32,
            )
            for j, s in enumerate(take):
                if jitter:
                    f_brig = max_brig * (-1.0) ** (rng.rand() < 0.5) * rng.rand()
                    f_cont = 1 + max_cont * (-1.0) ** (rng.rand() < 0.5) * rng.rand()
                else:
                    f_brig, f_cont = 0.0, 1.0
                for c in range(self.images.shape[4]):
                    a = int(n_aug * rng.rand()) if augment else 0
                    imgs[j, :, :, c] = self.images[s, :, :, a, c] * f_cont + f_brig
            yield {
                "image": imgs,
                "labels": self.labels[take],
                "weights": self.weights[take],
            }


class _PrefetchFeed:
    """Background host-feed pipeline (``TrainConfig.prefetch``): a daemon
    thread assembles and ``device_put``s upcoming batches into a bounded
    queue while the device executes the current step.  Yields exactly
    the wrapped generator's items in order; a feed exception re-raises
    at the consuming step.  ``close()`` unblocks and retires the thread
    early (fit errors / early returns)."""

    _DONE = object()

    def __init__(self, gen, depth: int):
        self._q = _queue_mod.Queue(maxsize=max(1, int(depth)))
        self._cancelled = threading.Event()
        self._err = None
        self._thread = threading.Thread(
            target=self._run, args=(gen,), daemon=True
        )
        self._thread.start()

    def _put(self, item) -> bool:
        while not self._cancelled.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except _queue_mod.Full:
                continue
        return False

    def _run(self, gen) -> None:
        try:
            for item in gen:
                if not self._put(item):
                    return
        except BaseException as e:  # noqa: BLE001 — re-raised at __next__
            self._err = e
        finally:
            self._put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        self._cancelled.set()


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------


class Trainer:
    """Full training loop with best-on-valid checkpointing and JSONL metrics."""

    def __init__(
        self,
        hp: HParams,
        cfg: TrainConfig,
        model_path: str,
        log_path: Optional[str] = None,
        params: Optional[Params] = None,
        mesh=None,
    ):
        self.hp = hp
        self.cfg = cfg
        self.model_path = model_path
        self.log_path = log_path
        self.mesh = mesh
        key = jax.random.PRNGKey(cfg.seed)
        self.params = params if params is not None else unet.init_params(
            key, hp, cfg.variant
        )
        self.tx = make_optimizer(cfg)
        if mesh is not None:
            from unmicst_tpu.runtime.mesh import put_params

            self.params = put_params(self.params, mesh)
        # init once, on the (possibly sharded) params — a pre-shard init
        # would allocate full Adam moments only to discard them
        self.opt_state = self.tx.init(self.params)
        self.train_step = make_train_step(hp, cfg, self.tx)
        self.eval_step = make_eval_step(hp, cfg)
        self.lowest_error = np.inf
        self.step = 0
        self.restored = False
        self._save_thread = None  # in-flight async checkpoint write
        self._save_error = None
        self._metrics_file = None
        self._tb_train = self._tb_valid = None
        self._panel_fn = None
        if log_path:
            os.makedirs(log_path, exist_ok=True)
            self._metrics_file = open(
                os.path.join(log_path, "metrics.jsonl"), "a"
            )
            # TensorBoard Train/Valid writers mirroring the reference
            # layout (UnMicst1-5.py:403-443): scalar summaries plus the
            # per-variant image panels of make_panel_fn (gated by
            # cfg.tb_images)
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb_train = SummaryWriter(os.path.join(log_path, "Train"))
                self._tb_valid = SummaryWriter(os.path.join(log_path, "Valid"))
                if cfg.tb_images:
                    self._panel_fn = make_panel_fn(hp, cfg)
            except ImportError:
                pass

    def _log(self, record: dict) -> None:
        if self._metrics_file:
            self._metrics_file.write(json.dumps(record) + "\n")
            self._metrics_file.flush()

    def _maybe_shard(self, batch):
        if self.mesh is None:
            return batch
        from unmicst_tpu.runtime.mesh import data_sharding

        sharding = data_sharding(self.mesh)
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}

    def fit(
        self,
        train_corpus: Corpus,
        valid_corpus: Corpus,
        n_steps: int,
        batch_size: Optional[int] = None,
        verbose: bool = True,
    ) -> float:
        """Run ``n_steps``; one train + one valid step per iteration
        (``UnMicst1-5.py:469-521``), validating every
        ``cfg.valid_every``-th step (plus the last) when the cadence is
        relaxed.  Returns best validation error."""
        cfg = self.cfg
        bs = batch_size or self.hp.batch_size
        rng_np = np.random.RandomState(cfg.seed + 1)
        train_iter = train_corpus.batches(
            bs, rng_np, augment=cfg.n_aug > 1, jitter=cfg.jitter
        )
        # reference validation protocol: random baked page, no jitter
        # (UnMicst1-5.py:498-505)
        valid_iter = valid_corpus.batches(
            bs, rng_np, augment=cfg.n_aug > 1, jitter=False
        )
        key = jax.random.PRNGKey(cfg.seed + 2)
        t0 = time.time()
        ve = max(1, int(cfg.valid_every))
        # (step, device metrics, elapsed) buffered between validations;
        # float()-ing a metric is a host sync, so non-validated steps
        # keep theirs on device and the drain happens at the next
        # validation point (the scalars are tiny — 3 per step)
        pending = []

        def _place(b):
            if self.mesh is not None:
                return self._maybe_shard(b)
            if cfg.prefetch > 0:
                # eager default-device put: starts the H2D copy from the
                # feed thread so it overlaps the in-flight device step
                # (the jit call would do the same copy, just serialized)
                return {k: jax.device_put(v) for k, v in b.items()}
            return b

        def _host_feed():
            # one (train, valid-or-None) pair per step; the valid batch
            # is only drawn on steps that will validate, so the shared
            # RNG stream advances exactly like the inline loop
            for i in range(n_steps):
                tb = _place(next(train_iter))
                vb = (
                    _place(next(valid_iter))
                    if (i % ve == 0 or i == n_steps - 1) else None
                )
                yield tb, vb

        feed = _host_feed()
        if cfg.prefetch > 0:
            feed = _PrefetchFeed(feed, cfg.prefetch)
        try:
            self._fit_loop(feed, key, t0, pending, verbose)
        finally:
            if isinstance(feed, _PrefetchFeed):
                feed.close()
            # fit returns only once checkpoints are durable on disk
            self._join_save()
        return self.lowest_error

    def _fit_loop(self, feed, key, t0, pending, verbose: bool) -> None:
        cfg = self.cfg
        for i, (batch, vbatch) in enumerate(feed):
            key, step_key = jax.random.split(key)
            self.params, self.opt_state, metrics = self.train_step(
                self.params, self.opt_state, batch, step_key
            )
            pending.append((self.step, metrics, time.time() - t0))
            if vbatch is None:
                self.step += 1
                continue
            vmetrics = self.eval_step(self.params, vbatch)
            e = float(vmetrics["mean_error"])
            if i == 0 and self.restored:
                # restoreVariables semantics: the first validation error of a
                # resumed run seeds the best-so-far (UnMicst1-5.py:513-517)
                self.lowest_error = e
            errors = [float(x) for x in np.asarray(vmetrics["errors"])]
            for s, m, el in pending:
                rec = {
                    "step": s,
                    "loss": float(m["loss"]),
                    "ce": float(m["ce"]),
                    "reg": float(m["reg"]),
                    "elapsed_s": el,
                }
                if s == self.step:
                    rec["valid_error"] = e
                    rec["errors"] = errors
                self._log(rec)
            if self._tb_train:
                # train scalars drain from the buffer AT THEIR OWN steps
                # (reference cadence every 20, :490,507 — with
                # valid_every > 1 the non-validated steps' losses are
                # already held in `pending`, so no TB points are lost)
                for s, m, _ in pending:
                    if s % 20 == 0:
                        self._tb_train.add_scalar(
                            "avg_cross_entropy", float(m["loss"]), s
                        )
                        self._tb_train.add_scalar(
                            "learning_rate",
                            cfg.lr0 * cfg.decay_rate
                            ** (s // cfg.decay_steps),
                            s,
                        )
                # valid scalars + image panels exist only on validated
                # steps; with a sparse cadence (valid_every > 20) every
                # validated step logs, else the reference every-20 gate
                if self.step % 20 == 0 or cfg.valid_every > 20:
                    for k, err in enumerate(errors):
                        self._tb_valid.add_scalar(
                            f"avg_pixel_error_{k}", float(err), self.step
                        )
                    self._tb_valid.add_scalar("mean_error", e, self.step)
                    if self._panel_fn is not None:
                        # one image per sample, like tf.summary.image's
                        # impm/image/<j> (not a padded grid)
                        for w, b in ((self._tb_train, batch),
                                     (self._tb_valid, vbatch)):
                            for tag, arr in self._panel_fn(
                                self.params, b["image"]
                            ).items():
                                for j in range(arr.shape[0]):
                                    w.add_image(
                                        f"{tag}/{j}", arr[j], self.step,
                                        dataformats="HWC",
                                    )
            pending.clear()
            if verbose:
                print(f"step {self.step:05d}, e: {e:f}")
            if self.step % cfg.ckpt_every == 0 and e < self.lowest_error:
                self.lowest_error = e
                self.save()
            self.step += 1

    def save(self) -> None:
        """Native checkpoint + reference-compatible sidecars
        (``UnMicst1-5.py:289-290,527``).

        With ``cfg.async_save`` the write runs on a background thread.
        The snapshot is one on-device copy (HBM-to-HBM, cheap vs the
        D2H pull) — a bare reference would not survive the next step's
        buffer donation (``make_train_step`` donates params/opt_state).
        The worker then pulls the copy D2H and serializes while training
        continues.  Writes are serialized (a new save joins the previous
        one); a worker error re-raises at the next save, at
        :meth:`close`, or when :meth:`fit` returns."""
        if not self.cfg.async_save:
            self._write_checkpoint(
                self.params, self.opt_state, self.step, self.lowest_error
            )
            return

        def _snap(x):
            return jnp.copy(x) if isinstance(x, jax.Array) else x

        state = (
            jax.tree_util.tree_map(_snap, self.params),
            jax.tree_util.tree_map(_snap, self.opt_state),
            self.step,
            self.lowest_error,
        )
        self._join_save()

        def _worker():
            try:
                self._write_checkpoint(*state)
            except BaseException as e:  # noqa: BLE001 — re-raised at join
                self._save_error = e

        self._save_thread = threading.Thread(target=_worker, daemon=True)
        self._save_thread.start()

    def _join_save(self) -> None:
        """Wait for an in-flight async save; re-raise its failure."""
        t = self._save_thread
        if t is not None:
            t.join()
            self._save_thread = None
        if self._save_error is not None:
            e, self._save_error = self._save_error, None
            raise e

    def _write_checkpoint(self, params, opt_state, step: int,
                          lowest_error: float) -> None:
        from unmicst_tpu.core.checkpoint import save_native

        os.makedirs(self.model_path, exist_ok=True)
        from flax import serialization as _ser

        host_params = jax.tree_util.tree_map(np.asarray, params)
        # persist the optimizer state too (reference Saver restores the
        # Momentum/Adam slots and globalStep, UnMicst1-5.py:445-447);
        # step+1 = the step a resumed run continues AT (save happens
        # before the in-loop increment)
        host_opt = jax.tree_util.tree_map(np.asarray, opt_state)
        save_native(
            os.path.join(self.model_path, "model.unmicst-tpu.msgpack"),
            host_params,
            self.hp,
            self.cfg.variant,
            self.cfg.dataset_mean,
            self.cfg.dataset_std,
            extra={
                "step": step + 1,
                "valid_error": lowest_error,
            },
            extra_arrays={"opt_state": _ser.to_state_dict(host_opt)},
        )
        save_pickle(self.hp.to_ref_dict(), os.path.join(self.model_path, "hp.data"))
        save_pickle(
            self.cfg.dataset_mean, os.path.join(self.model_path, "datasetMean.data")
        )
        save_pickle(
            self.cfg.dataset_std, os.path.join(self.model_path, "datasetStDev.data")
        )
        if self.cfg.export_tf1:
            # reference-restorable bundle + Saver state file, so the model
            # dir is a drop-in for the upstream tool
            from unmicst_tpu.core.checkpoint import save_tf1_params

            save_tf1_params(
                os.path.join(self.model_path, "model.ckpt"),
                host_params, self.hp, self.cfg.variant,
                global_step=step + 1,
            )
            with open(os.path.join(self.model_path, "checkpoint"), "w") as f:
                f.write('model_checkpoint_path: "model.ckpt"\n')
                f.write('all_model_checkpoint_paths: "model.ckpt"\n')

    def close(self) -> None:
        """Flush and release the metrics/TensorBoard sinks (the reference
        closes its writers, UnMicst1-5.py:530-532); joins any in-flight
        async checkpoint write first."""
        self._join_save()
        if self._metrics_file:
            self._metrics_file.close()
            self._metrics_file = None
        for w in (self._tb_train, self._tb_valid):
            if w is not None:
                w.flush()
                w.close()
        self._tb_train = self._tb_valid = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def restore(self, path: Optional[str] = None) -> None:
        """Resume from a native checkpoint (``restoreVariables`` semantics,
        ``UnMicst1-5.py:445-447``)."""
        from unmicst_tpu.core.checkpoint import load_native

        self._join_save()  # never read a checkpoint mid-write
        path = path or os.path.join(self.model_path, "model.unmicst-tpu.msgpack")
        params, hp, variant, _, _, meta = load_native(path)
        if hp != self.hp or variant != self.cfg.variant:
            raise ValueError("checkpoint hp/variant mismatch")
        if self.mesh is not None:
            # keep the dp/tp placement __init__ established
            from unmicst_tpu.runtime.mesh import put_params

            params = put_params(params, self.mesh)
        self.params = params
        self.opt_state = self.tx.init(self.params)
        self.step = int(meta.get("step", 0))
        saved_opt = meta.get("_extra_arrays", {}).get("opt_state")
        if saved_opt is not None:
            # restore Momentum/Adam slots AND the schedule count so the
            # resumed lr continues decayed (reference restoreVariables
            # semantics: Saver restores slots + globalStep)
            from flax import serialization as _ser

            self.opt_state = _ser.from_state_dict(self.opt_state, saved_opt)
        else:
            # old checkpoint without slots: at least fast-forward the
            # schedule so lr does not restart at lr0
            try:
                import optax

                self.opt_state = optax.tree_utils.tree_set(
                    self.opt_state, count=jnp.int32(self.step)
                )
            except Exception:
                pass
        self.restored = True


def render_test_montages(
    params: Params,
    hp: HParams,
    cfg: TrainConfig,
    corpus: Corpus,
    pm_path: str,
    classes: Optional[Dict[str, int]] = None,
) -> None:
    """Post-train test rendering (``UnMicst1-5.py:553-579``).

    Writes per-augmentation montage PNGs ``I%05d_%d_{Nuc,Con}.png`` showing
    ``[sqrt(normalized image) | probability map | ground truth]``.  Legacy
    naming (`UnMicst.py:400-405`): pass ``classes={'': test_pm_index}``.
    """
    from PIL import Image

    if classes is None:
        classes = {"Nuc": 2, "Con": 1}
    os.makedirs(pm_path, exist_ok=True)
    fwd = jax.jit(lambda p, x: unet.apply(p, x, hp, cfg.variant, precision=cfg.precision))
    n_aug = corpus.images.shape[3]
    for a in range(n_aug):
        x = corpus.images[:, :, :, a, :]  # (n, S, S, C)
        probs = np.asarray(fwd(params, jnp.asarray(x)))
        for i in range(corpus.n):
            im = x[i, :, :, 0]
            lo, hi = im.min(), im.max()
            norm = np.sqrt((im - lo) / (hi - lo)) if hi > lo else im * 0
            for suffix, cls in classes.items():
                pm = probs[i, :, :, cls]
                gt = corpus.labels[i, :, :, cls]
                montage = np.concatenate([norm, pm, gt], axis=1)
                name = (
                    f"I{i + 1:05d}_{a}_{suffix}.png" if suffix else f"I{i + 1:05d}.png"
                )
                Image.fromarray(np.uint8(255 * np.clip(montage, 0, 1))).save(
                    os.path.join(pm_path, name)
                )
