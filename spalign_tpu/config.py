"""Typed configuration for every pipeline in the framework.

The reference duplicates ~70 lines of argparse flags across three scripts
(reference batch_spalign_kmeans.py:38-108, direct_clustering.py,
superpixel_overlaps.py) and snapshots them into every artifact via
``vars(args)``.  Here a single set of dataclasses is shared by all entry
points; ``asdict`` of the active config is serialized into every
result.json record and checkpoint directory, preserving the reference's
provenance behavior (batch_spalign_kmeans.py:419, train_segnet.py:253-254).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class PriorConfig:
    """Gaussian road-location prior (reference batch_spalign_kmeans.py:111-129).

    weights = exp(-((y - int(H*y_rel_pos))^2 / (2*H*y_rel_sigma)^2
                    + (x - int(W*x_rel_pos))^2 / (2*W*x_rel_sigma)^2))

    Note the reference divides by ``(2*sigma)**2``, not ``2*sigma**2``; we
    reproduce that exactly.
    """

    y_rel_pos: float = 0.75
    x_rel_pos: float = 0.5
    y_rel_sigma: float = 0.1
    x_rel_sigma: float = 0.1


@dataclass(frozen=True)
class SuperpixelConfig:
    """Superpixel frontend (reference batch_spalign_kmeans.py:299-313).

    ``method='felzenszwalb'`` runs the native C++ host op (the reference's
    headline configuration); ``method='slic'`` runs the TPU-device SLIC.
    """

    method: str = "felzenszwalb"  # 'felzenszwalb' | 'slic'
    # felzenszwalb params (reference defaults :71-73; canonical shell
    # wrappers use scale=300 sigma=0.8 min_size=20)
    felzenszwalb_scale: float = 300.0
    felzenszwalb_sigma: float = 0.8
    felzenszwalb_min_size: int = 20
    # slic params (reference :74; skimage-equivalent defaults)
    n_slic_segments: int = 100
    slic_compactness: float = 10.0
    slic_iters: int = 10
    # skimage-parity connectivity enforcement (host union-find splitting
    # non-contiguous SLIC labels).  False = TPU-native fast path: SLIC
    # runs INSIDE the fused device program (superpixel count fixed at
    # the grid size, disconnected regions may share a label) — one
    # dispatch per batch, no host superpixel work at all.
    slic_enforce_connectivity: bool = True
    # Device-SLIC frontends only (documented deviation, quality-gated):
    # compute the superpixels at 1/d scale.  Overlaps mode: the 2 MP
    # frame upload is its binding cost (~3 MB/img even as YUV420); d=2
    # quarters it and the refined mask is NN-upsampled back.  Fused
    # spalign: the dense SLIC sweep is HBM-bound on its (HW, K)
    # materialization at ~95% of the v5e bandwidth peak
    # (docs/label_profile.md), so d=2 cuts the dominant device stage
    # ~4x; anchors/prior/painting follow the map's resolution and the
    # appended center of mass is rescaled to image units.  1 = exact
    # full resolution.
    slic_device_downscale: int = 1
    # padding bound for the per-image superpixel count on device
    max_superpixels: int = 1024


@dataclass(frozen=True)
class AlignConfig:
    """Superpixel-align pooling (reference batch_spalign_kmeans.py:210-276)."""

    n_anchors: int = 10
    # The reference's "n_neighbors nearest cells" reduces in closed form
    # to the enclosing 2x2 bilinear cell when n_neighbors == 4 (the only
    # value its shell wrappers ever use) — see ops/align.py.  Other
    # values would need a different interpolation scheme, so they are
    # rejected rather than silently ignored.
    n_neighbors: int = 4
    append_pos: bool = True  # append the superpixel center of mass (y, x)

    def __post_init__(self):
        if self.n_neighbors != 4:
            raise ValueError(
                f"n_neighbors={self.n_neighbors} is not supported: the "
                "4-nearest-cells rule of the reference is implemented as "
                "its closed-form 2x2 bilinear equivalent (ops/align.py), "
                "which only exists for n_neighbors=4")


@dataclass(frozen=True)
class KMeansConfig:
    """Prior-seeded weighted k-means (reference batch_spalign_kmeans.py:136-207)."""

    n_clusters: int = 4
    n_iter: int = 1000
    seed: int = 1111
    # number of full re-runs if an image ends up with an empty road mask
    # (replaces the reference's broken retry recursion at :201-205)
    max_retries: int = 3
    # 'device': jax-PRNG seeding shuffle, fully fused program (default).
    # 'reference': bit-parity mode — float64 host prior + the reference's
    # exact numpy seed-1111 init stream feeding the device Lloyd loop
    # (ops/parity.py; slower: one host round trip per batch).
    init: str = "device"

    def __post_init__(self):
        if self.init not in ("device", "reference"):
            raise ValueError(f"init must be 'device' or 'reference', "
                             f"got {self.init!r}")


@dataclass(frozen=True)
class LabelGenConfig:
    """Label-generation pipeline config (reference batch_spalign_kmeans.py
    CLI :38-108 plus direct_clustering / superpixel_overlaps variants)."""

    mode: str = "spalign"  # 'spalign' | 'direct' | 'overlaps'
    resize_shape: Tuple[int, int] = (224, 224)  # (H, W) model input
    batchsize: int = 30  # joint-clustering batch
    use_feature_maps: Tuple[int, ...] = (7,)  # DRN stage outputs to concat
    prior: PriorConfig = field(default_factory=PriorConfig)
    superpixel: SuperpixelConfig = field(default_factory=SuperpixelConfig)
    align: AlignConfig = field(default_factory=AlignConfig)
    kmeans: KMeansConfig = field(default_factory=KMeansConfig)
    # 'overlaps' mode: superpixel kept as road if
    # overlap / n_predicted_road_pixels > overlap_threshold
    # (reference superpixel_overlaps.py:79,359-369)
    overlap_threshold: float = 0.01
    # Number of INDEPENDENT clustering batches fused into one device
    # dispatch (vmapped over a group axis; per-group semantics stay
    # reference-exact).  On remote-attached TPUs every dispatch pays a
    # fixed ~40 ms upload + round-trip tax; grouping amortizes it.  The
    # parity init path always runs one group per dispatch.
    groups_per_dispatch: int = 1
    out_dir: str = "results/labels"
    save_images: bool = False  # diagnostic 2x2 panels
    save_masks: bool = True
    # Feature-extractor compute dtype.  bfloat16 is the default: the DRN
    # forward runs on the MXU at 2x the f32 rate, k-means still
    # accumulates in f32 (ops/kmeans.py casts), and the mask-level IoU
    # delta on the synthetic quality gate is within run noise
    # (tests/test_pipeline_e2e.py::TestBF16::test_quality_gate_f32_vs_bf16).
    # Bit-parity mode (kmeans.init='reference') pins f32 regardless.
    model_dtype: str = "bfloat16"  # 'float32' | 'bfloat16'
    # Image uplink wire format (pipeline/wire.py).  'yuv420' halves the
    # bytes per image (1.5 B/px, BT.601 + 2x2 chroma subsampling,
    # decoded on device) — the uplink is the fused pipeline's binding
    # constraint on remote-attached TPUs.  Supported on the fused-SLIC
    # spalign path and the direct mode; parity mode rejects it.
    upload_format: str = "rgb8"  # 'rgb8' | 'yuv420'

    def __post_init__(self):
        sp = self.superpixel
        if sp.slic_device_downscale > 1:
            d = sp.slic_device_downscale
            device_slic = (sp.method == "slic"
                           and not sp.slic_enforce_connectivity)
            fused_spalign = (self.mode == "spalign" and device_slic
                             and self.kmeans.init == "device")
            if not (device_slic
                    and (self.mode == "overlaps" or fused_spalign)):
                # only the overlaps device-SLIC frontend and the fused
                # spalign program read this knob; every other path would
                # silently ignore it
                raise ValueError(
                    "slic_device_downscale > 1 applies only to the "
                    "device-SLIC frontends: mode='overlaps' or "
                    "mode='spalign' with kmeans.init='device', both "
                    "with superpixel method='slic' and "
                    "slic_enforce_connectivity=False; got "
                    f"mode={self.mode!r}, method={sp.method!r}, "
                    f"slic_enforce_connectivity="
                    f"{sp.slic_enforce_connectivity}, "
                    f"kmeans.init={self.kmeans.init!r}")
            if fused_spalign and (self.resize_shape[0] % d
                                  or self.resize_shape[1] % d):
                raise ValueError(
                    f"slic_device_downscale={d} must divide "
                    f"resize_shape={self.resize_shape}")


@dataclass(frozen=True)
class TrainConfig:
    """SegNet training config (reference train_segnet.py:41-94)."""

    model: str = "basic"  # 'basic' | 'normal'
    n_class: int = 2
    batchsize: int = 8  # GLOBAL batch (reference: per-rank 1 x 8 ranks)
    lr: float = 0.01
    decay_iteration: int = 300  # lr *= 0.1 every N iters (MomentumSGD only)
    weight_decay: float = 0.0005
    train_iters: int = 2000
    optimizer: str = "Adam"  # 'Adam' | 'MomentumSGD'
    input_shape: Tuple[int, int] = (512, 1024)
    eval_shape: Tuple[int, int] = (1024, 2048)
    augment: bool = False  # PCA lighting + horizontal flip
    log_interval: int = 50
    val_interval: int = 100
    loss: str = "ce"  # 'ce' | 'soft' | 'mse'
    n_use_data: Optional[int] = None
    seed: int = 0
    result_dir: str = "results/train"
    resume: Optional[str] = None
    # parallelism: data-parallel axis size; None = all visible devices
    num_devices: Optional[int] = None
    compute_dtype: str = "float32"


@dataclass(frozen=True)
class RoundsConfig:
    """Self-training rounds (reference utils/run_train_rounds.py:26-67)."""

    n_round: int = 1
    iteration: int = 2000
    val_iteration: int = 100
    loss: str = "ce"
    augment: bool = False
    test_mode: bool = False
    batchsize: int = 8
    result_base_dir: str = "results"
    eval_shape: Tuple[int, int] = (1024, 2048)
    n_labels: Optional[int] = None  # inferred from dataset if None
    # On-disk/downlink dtype for soft relabel scores.  float16 halves
    # both the fetch (the relabel pass's dominant cost on remote-
    # attached TPUs) and the zip; scores are softmax probabilities, so
    # the quantization is ~1e-4 absolute.  The reference writes float32
    # (labels_from_segnet.py:86-95) — set "float32" for disk parity.
    score_dtype: str = "float16"
    # Resolution of the stored *_scores zip members.  "network" (the
    # rounds-loop default) keeps them at the network output resolution:
    # the reference's eval-res array (labels_from_segnet.py:91-95) is a
    # deterministic bilinear upsample of it carrying zero information —
    # the training reader resizes scores back to the input resolution
    # anyway (data/estimated.py) — while materializing it costs ~210
    # ms/img of host time (tools/relabel_probe.py).  Set "eval" for
    # reference disk parity.  PRED members are identical either way.
    score_store: str = "network"
    # Relabel image-uplink wire (selftrain/relabel.py): "auto" ships the
    # recovered uint8 pixels when the dataset's standardization inverts
    # exactly (4x less uplink than f32, exact to 1 ulp).  "yuv420"
    # halves that again with 2x2-subsampled chroma — lossy, so opt-in
    # and gated by a prediction-agreement test vs the u8 wire
    # (tests/test_selftrain.py).  The pass is uplink-bound (~85 of ~86
    # ms/img at the u8 wire, docs/perf_playbook.md §5).
    input_wire: str = "auto"


def to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True,
                      default=str)


def flatten(cfg, prefix: str = "") -> dict:
    """Flatten a (possibly nested) config dataclass into a flat dict for
    embedding into result.json records (reference behavior:
    ``result_info.update(vars(args))``)."""
    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        key = f"{prefix}{f.name}"
        if dataclasses.is_dataclass(v):
            out.update(flatten(v, prefix=f"{f.name}."))
        elif isinstance(v, tuple):
            out[key] = list(v)
        else:
            out[key] = v
    return out
