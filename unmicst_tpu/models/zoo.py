"""Model zoo registry — manifests for the 7 shipped model directories.

Mirrors the reference ``models/`` inventory (SURVEY #2.4) including where
the large checkpoint blobs live: two are fetched from S3 at Docker build
time upstream (``Dockerfile:4-5``); the rest ship in-repo (some with data
blobs missing upstream, noted below).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

S3_BASE = "https://mcmicro.s3.amazonaws.com/models"


@dataclasses.dataclass(frozen=True)
class ZooEntry:
    name: str
    tool: str  # which CLI tool defaults to / uses it
    variant: str  # architecture generation
    im_size: int
    n_classes: int
    n_channels: int
    ckpt_url: Optional[str] = None  # S3 blob if not shipped in-repo
    notes: str = ""


ZOO = {
    "nucleiDAPI": ZooEntry(
        "nucleiDAPI", "unmicst-legacy", "legacy", 128, 3, 1,
        notes="default legacy model; checkpoint ships in-repo",
    ),
    "nucleiDAPI1-5": ZooEntry(
        "nucleiDAPI1-5", "unmicst-solo", "v2", 64, 3, 1,
        # S3 key is "unmicst1-5", not the model-dir name (Dockerfile:5)
        ckpt_url=f"{S3_BASE}/unmicst1-5/model.ckpt.data-00000-of-00001",
        notes="default solo model; blob fetched from S3 (Dockerfile:5)",
    ),
    "nucleiDAPILAMIN": ZooEntry(
        "nucleiDAPILAMIN", "unmicst-duo", "v2", 128, 3, 2,
        # S3 key is "unmicst2", not the model-dir name (Dockerfile:4)
        ckpt_url=f"{S3_BASE}/unmicst2/model.ckpt.data-00000-of-00001",
        notes="default duo model; blob fetched from S3 (Dockerfile:4)",
    ),
    "CytoplasmIncell2": ZooEntry(
        "CytoplasmIncell2", "UnMicstCyto2", "v2", 256, 2, 1,
        notes="data blob missing upstream (.MISSING_LARGE_BLOBS)",
    ),
    "CytoplasmIncell": ZooEntry(
        "CytoplasmIncell", "UnMicstCyto2", "legacy", 128, 2, 1,
        notes="checkpoint ships in-repo",
    ),
    "CytoplasmZeissNikon": ZooEntry(
        "CytoplasmZeissNikon", "UnMicstCyto2", "legacy", 256, 2, 1,
        notes="data blob missing upstream",
    ),
    "mousenucleiDAPI": ZooEntry(
        "mousenucleiDAPI", "unmicst-legacy", "legacy", 256, 3, 1,
        notes="model.ckpt data missing upstream; alternate bundle "
        "nuclei20x2bin1chan is auto-discovered by the loader",
    ),
}


def fetch_model(name: str, model_root: str, timeout: float = 120.0) -> str:
    """Download the published checkpoint blob for ``name`` into its
    model dir (atomic .part rename), making the zoo entry loadable —
    the user-facing wrapper over the Dockerfile:4-5 S3 fetches the
    reference performs at image-build time.

    Returns 'ready' (nothing to do) or 'fetched'.  Raises ValueError
    for unknown names / entries with no published blob, OSError when
    the network is unreachable (zero-egress environments)."""
    import shutil
    import urllib.request

    entry = ZOO.get(name)
    if entry is None:
        raise ValueError(
            f"unknown zoo model {name!r}; known: {sorted(ZOO)}"
        )
    if available_models(model_root).get(name) == "ready":
        return "ready"
    if entry.ckpt_url is None:
        raise ValueError(
            f"{name} has no published checkpoint blob (upstream ships "
            "it incomplete too — see the zoo notes)"
        )
    d = os.path.join(model_root, name)
    if not os.path.isdir(d):
        raise ValueError(
            f"model dir {d} absent — the sidecars (hp.data, index) ship "
            "in-repo; point --modelRoot at a checkout's models/ tree"
        )
    dst = os.path.join(d, "model.ckpt.data-00000-of-00001")
    tmp = dst + ".part"
    try:
        with urllib.request.urlopen(entry.ckpt_url, timeout=timeout) as r, \
                open(tmp, "wb") as f:
            shutil.copyfileobj(r, f, 1 << 20)
        os.replace(tmp, dst)
    finally:
        if os.path.exists(tmp):  # failed mid-transfer: no stale .part
            os.unlink(tmp)
    if available_models(model_root).get(name) != "ready":
        raise ValueError(
            f"fetched {entry.ckpt_url} but {name} is still not loadable "
            "— blob/index mismatch?"
        )
    return "fetched"


def stage_sidecars(name: str, src_root: str, dst_root: str) -> str:
    """Copy a zoo entry's small sidecar files (checkpoint index/meta,
    hp.data — everything except the large ``.data-*`` blobs) from
    ``src_root`` into ``dst_root`` so ``fetch_model`` can download the
    blob into a writable tree.  Mirrors the reference's layout where the
    sidecars ship in the checkout and only the blob comes from S3
    (Dockerfile:4-5).  Returns the staged model dir; no-op for files
    that already exist at the destination."""
    import shutil

    src = os.path.join(src_root, name)
    dst = os.path.join(dst_root, name)
    if not os.path.isdir(src):
        raise ValueError(f"no model dir {src} to stage sidecars from")
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(src)):
        if ".data-" in f:  # the large blob(s) — fetched, never copied
            continue
        s, d = os.path.join(src, f), os.path.join(dst, f)
        if os.path.isfile(s) and not os.path.exists(d):
            shutil.copy(s, d)
    return dst


def available_models(model_root: str) -> dict:
    """Which zoo entries are actually loadable under ``model_root``."""
    from unmicst_tpu.core.checkpoint import _find_ckpt_prefix

    def _ready(d: str) -> bool:
        return bool(
            _find_ckpt_prefix(d)
            or os.path.exists(os.path.join(d, "model.unmicst-tpu.msgpack"))
        )

    out = {}
    for name, entry in ZOO.items():
        d = os.path.join(model_root, name)
        if not os.path.isdir(d):
            out[name] = "absent"
        elif _ready(d):
            out[name] = "ready"
        else:
            out[name] = "needs-blob" + (
                f" ({entry.ckpt_url})" if entry.ckpt_url else ""
            )
    # locally-trained model dirs outside the upstream registry
    if os.path.isdir(model_root):
        for name in sorted(os.listdir(model_root)):
            d = os.path.join(model_root, name)
            if name not in ZOO and os.path.isdir(d) and os.path.exists(
                os.path.join(d, "hp.data")
            ):
                out[name] = "ready (local)" if _ready(d) else "needs-blob"
    return out
