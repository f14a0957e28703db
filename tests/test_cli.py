"""CLI smoke tests (in-process main(argv) calls, tiny shapes)."""

import json
import os
import zipfile

import numpy as np
import pytest


class TestMakeZips:
    def test_synthetic(self, tmp_path):
        from spalign_tpu.cli.make_zips import main

        prefix = str(tmp_path / "syn")
        main(["synthetic", "--n", "3", "--shape", "128", "256",
              "--out_prefix", prefix])
        with zipfile.ZipFile(prefix + "_imgs.0.zip") as zf:
            assert len(zf.namelist()) == 3
        with zipfile.ZipFile(prefix + "_labels.0.zip") as zf:
            assert all(n.endswith("labelIds.png") for n in zf.namelist())


class TestLabelGenCLI:
    def test_synthetic_slic(self, tmp_path):
        from spalign_tpu.cli.label_gen import main

        out = str(tmp_path / "labels")
        records = main([
            "--synthetic", "4", "--synthetic_shape", "128", "256",
            "--superpixel_method", "slic", "--n_slic_segments", "40",
            "--max_superpixels", "128", "--resize_shape", "112", "112",
            "--batchsize", "4", "--out_dir", out])
        assert len(records) == 4
        assert os.path.exists(os.path.join(out, "result.json"))
        assert os.path.exists(os.path.join(out, "summary.txt"))

    def test_mean_result_roundtrip(self, tmp_path, capsys):
        from spalign_tpu.cli.mean_result import main as mean_main

        path = tmp_path / "result.json"
        with open(path, "w") as f:
            for i in range(3):
                f.write(json.dumps({
                    "img_fn": f"img{i}.png", "road_iou": 0.5 + 0.1 * i,
                    "non_road_iou": 0.8, "precision": 0.7, "recall": 0.9,
                    "TP": 100, "FP": 40, "FN": 10}) + "\n")
        mean_main([str(path)])
        out = capsys.readouterr().out
        assert "Road mean IoU" in out
        assert os.path.exists(tmp_path / "summary.txt")


class TestBottomHalfCLI:
    def test_synthetic(self, capsys):
        from spalign_tpu.cli.bottom_half import main

        main(["--synthetic", "2", "--synthetic_shape", "128", "256"])
        out = capsys.readouterr().out
        iou = float(out.split("road IoU  :")[1].split()[0])
        assert 0.05 < iou < 0.95


class TestSweepHelpers:
    def test_set_nested(self):
        from spalign_tpu.cli.sweep import set_nested
        from spalign_tpu.config import LabelGenConfig

        cfg = LabelGenConfig()
        c2 = set_nested(cfg, "kmeans.n_clusters", 7)
        assert c2.kmeans.n_clusters == 7
        assert cfg.kmeans.n_clusters == 4
        c3 = set_nested(cfg, "batchsize", 5)
        assert c3.batchsize == 5

    def test_k_sweep_compiles_once(self, tmp_path):
        """The fig-7 grid (k sweep) must run as ONE compiled program:
        dynamic_k makes the cluster count a runtime value (the reference
        re-ran the whole pipeline per k, utils/dmux/run_exp_fig-7.sh)."""
        from spalign_tpu.cli.sweep import main

        csv = str(tmp_path / "sweep.csv")
        main(["--grid", "custom", "--param", "kmeans.n_clusters",
              "--values", "2", "3", "4", "--sweep_out", csv,
              "--synthetic", "4", "--synthetic_shape", "128", "256",
              "--superpixel_method", "slic", "--n_slic_segments", "40",
              "--max_superpixels", "128", "--resize_shape", "112", "112",
              "--batchsize", "4", "--out_dir", str(tmp_path / "labels")])
        lines = open(csv).read().strip().splitlines()
        assert lines[0].endswith("program_traces")
        traces = [int(l.rsplit(",", 1)[1]) for l in lines[1:]]
        assert len(traces) == 3
        assert traces[-1] == 1  # one trace across all three k values

    def test_host_param_sweep_shares_program(self, tmp_path):
        """Sweeping a host-only parameter (felzenszwalb scale, fig-9)
        must not recompile the fused device program."""
        from spalign_tpu.cli.sweep import main

        csv = str(tmp_path / "sweep9.csv")
        main(["--grid", "custom", "--param",
              "superpixel.felzenszwalb_scale", "--values", "100", "300",
              "--sweep_out", csv,
              "--synthetic", "2", "--synthetic_shape", "128", "256",
              "--superpixel_method", "felzenszwalb",
              "--max_superpixels", "512", "--resize_shape", "112", "112",
              "--batchsize", "2", "--out_dir", str(tmp_path / "labels")])
        lines = open(csv).read().strip().splitlines()
        traces = [int(l.rsplit(",", 1)[1]) for l in lines[1:]]
        assert traces[-1] == 1


class TestTablesCLI:
    def test_make_table(self, tmp_path, capsys):
        from spalign_tpu.cli.make_table import main

        for rnd, iou in [(1, 0.5), (2, 0.6)]:
            d = tmp_path / f"train_round{rnd}"
            os.makedirs(d)
            with open(d / "log", "w") as f:
                json.dump([{"iteration": 10,
                            "val/main/iou/road": iou,
                            "val/main/precision": 0.7,
                            "val/main/recall": 0.8}], f)
        main([str(tmp_path)])
        csv = open(tmp_path / "rounds.csv").read()
        assert "1,0.5" in csv and "2,0.6" in csv
