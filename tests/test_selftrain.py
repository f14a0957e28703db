"""Self-training round-driver smoke test — the in-process equivalent of
the reference's utils/test.sh (--test_mode: tiny iterations, few images,
multiple rounds), with real assertions on artifacts."""

import glob
import os
import zipfile

import cv2
import numpy as np

from spalign_tpu.config import RoundsConfig, TrainConfig
from spalign_tpu.data.cityscapes import CITYSCAPES_MEAN, CITYSCAPES_STD
from spalign_tpu.data.estimated import EstimatedCityscapesDataset
from spalign_tpu.data.synthetic import SyntheticRoadScenes
from spalign_tpu.selftrain import NpzShardWriter, RoundsDriver
from spalign_tpu.train.checkpoints import find_snapshot, load_snapshot

HW = (32, 64)
N = 8


class RelabelAdapter:
    """(standardized image at input res, full-res gt) + image_name."""

    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def image_name(self, i):
        return self.ds.image_name(i)

    def __getitem__(self, i):
        img, lab = self.ds[i]
        img = (img.astype(np.float32) - CITYSCAPES_MEAN) / CITYSCAPES_STD
        return img, (lab == 7).astype(np.int32)

    def full_images(self, indices):
        return [np.asarray(self.ds[i][0], np.uint8) for i in indices]


def setup_sources(tmp_path):
    ds = SyntheticRoadScenes(n=N, full_shape=HW, seed=13)
    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    init_zip = str(tmp_path / "initial_labels.0.zip")
    w = NpzShardWriter(init_zip)
    for i in range(N):
        img, lab = ds[i]
        base = os.path.splitext(ds.image_name(i))[0]
        cv2.imwrite(os.path.join(img_dir, base + ".png"), img[:, :, ::-1])
        road = lab == 7
        w.put(base, road)
        w.put(base + "_scores",
              np.stack([1.0 - road, road]).astype(np.float32))
    w.close()
    return ds, img_dir, init_zip


def test_two_rounds_end_to_end(tmp_path):
    ds, img_dir, init_zip = setup_sources(tmp_path)

    cfg = RoundsConfig(n_round=2, iteration=4, val_iteration=4,
                       batchsize=4, loss="ce",
                       result_base_dir=str(tmp_path / "results"),
                       eval_shape=HW)
    tcfg = TrainConfig(model="basic", optimizer="Adam", input_shape=HW,
                       eval_shape=HW, num_devices=4)

    def make_train_dataset(label_source, use_soft):
        return EstimatedCityscapesDataset(
            img_dir, label_source or init_zip, HW,
            use_soft_label=use_soft)

    driver = RoundsDriver(cfg, tcfg, make_train_dataset,
                          lambda: RelabelAdapter(ds))
    final_dir, final_zip = driver.run(initial_label_source=None)

    # round dirs + snapshots at the cumulative iteration counts
    r1 = str(tmp_path / "results" / "train_round1")
    r2 = str(tmp_path / "results" / "train_round2")
    assert find_snapshot(r1).endswith("snapshot_iter_4")
    assert find_snapshot(r2).endswith("snapshot_iter_8")
    assert final_dir == r2
    state = load_snapshot(find_snapshot(r2))
    assert int(state.step) == 8

    # relabel zips readable, both rounds; hard-label rounds write only
    # pred members (scores are skipped as never read)
    for rdir, it in [(r1, 4), (r2, 8)]:
        zf_path = os.path.join(rdir, f"iter-{it}_eval-train.0.zip")
        assert os.path.exists(zf_path)
        with zipfile.ZipFile(zf_path) as zf:
            names = zf.namelist()
        assert len(names) == N
        # loadable as npz
        with np.load(zf_path) as npz:
            key = [k for k in npz.files if not k.endswith("_scores")][0]
            pred = npz[key]
            assert pred.shape == HW and pred.dtype == bool
        # relabel eval JSONL exists
        assert os.path.exists(os.path.join(
            rdir, f"iter-{it}_eval-train", "result.json"))

    # round-2 training consumed round-1's relabel zip: its dataset is
    # constructible from it
    d2 = EstimatedCityscapesDataset(
        img_dir, os.path.join(r1, "iter-4_eval-train.0.zip"), HW)
    assert len(d2) == N

    # args.txt provenance in each round dir
    assert os.path.exists(os.path.join(r1, "args.txt"))
    assert os.path.exists(os.path.join(r2, "args.txt"))


def test_soft_label_round(tmp_path):
    """One round with soft labels + MSE-compatible scores."""
    ds, img_dir, init_zip = setup_sources(tmp_path)
    cfg = RoundsConfig(n_round=1, iteration=2, val_iteration=2,
                       batchsize=4, loss="soft",
                       result_base_dir=str(tmp_path / "results"),
                       eval_shape=HW)
    tcfg = TrainConfig(model="basic", optimizer="Adam", input_shape=HW,
                       eval_shape=HW, num_devices=2)

    def make_train_dataset(label_source, use_soft):
        return EstimatedCityscapesDataset(img_dir,
                                          label_source or init_zip, HW,
                                          use_soft_label=use_soft)

    driver = RoundsDriver(cfg, tcfg, make_train_dataset,
                          lambda: RelabelAdapter(ds))
    final_dir, final_zip = driver.run()
    assert os.path.exists(final_zip)


def test_relabel_panels(tmp_path):
    """--save_panels writes the reference's 1x3 diagnostic panel per
    image (labels_from_segnet.py:97-119)."""
    import jax

    from spalign_tpu.models import SegNetBasic
    from spalign_tpu.selftrain.relabel import relabel_dataset

    ds, img_dir, init_zip = setup_sources(tmp_path)
    adapter = RelabelAdapter(ds)
    model = SegNetBasic(n_class=2)
    variables = model.init(jax.random.key(0),
                           np.zeros((1, *HW, 3), np.float32))
    out_dir = str(tmp_path / "panels")
    relabel_dataset(model, variables, adapter,
                    str(tmp_path / "labels.0.zip"), eval_shape=HW,
                    batch_size=4, soft_label=False, out_dir=out_dir,
                    save_panels=True)
    pngs = glob.glob(os.path.join(out_dir, "*leftImg8bit.png"))
    assert len(pngs) == N
    assert cv2.imread(pngs[0]) is not None  # valid image files


def test_n_use_data_subsets_training(tmp_path):
    ds, img_dir, init_zip = setup_sources(tmp_path)
    cfg = RoundsConfig(n_round=1, iteration=2, val_iteration=2,
                       batchsize=2, loss="ce",
                       result_base_dir=str(tmp_path / "results"),
                       eval_shape=HW)
    tcfg = TrainConfig(model="basic", optimizer="Adam", input_shape=HW,
                       eval_shape=HW, num_devices=2, n_use_data=4)

    seen = []

    def make_train_dataset(label_source, use_soft):
        base = EstimatedCityscapesDataset(img_dir,
                                          label_source or init_zip, HW)

        class Spy:
            def __len__(self):
                return len(base)

            def __getitem__(self, i):
                seen.append(i)
                return base[i]

        return Spy()

    driver = RoundsDriver(cfg, tcfg, make_train_dataset,
                          lambda: RelabelAdapter(ds))
    driver.run()
    assert seen and max(seen) < 4  # only the first n_use_data indices
