"""CLI entry points end-to-end (hermetic --synthetic modes, tiny configs)."""

import json
import os

import pytest


def test_train_then_test_cli(tmp_path, capsys):
    import train_3dmatch

    rc = train_3dmatch.main([
        "--synthetic", "--num_layers", "2", "--first_features_dim", "16",
        "--first_subsampling_dl", "0.1", "--max_epoch", "1",
        "--training_max_iter", "2", "--val_max_iter", "1",
        "--cap_points", "4096", "2048", "--cap_neighbors", "16", "16",
        "--cap_corr", "128", "--query_tile", "256",
        "--snapshot_root", str(tmp_path), "--experiment_id", "cli",
        "--num_workers", "2", "--verbose", "false",
    ])
    assert rc == 0
    snap = tmp_path / "cli"
    assert (snap / "model_final").is_dir()
    assert (snap / "config.json").exists()

    import test_3dmatch

    rc = test_3dmatch.main([
        "--synthetic", "--chosen_snapshot", str(snap),
        "--snapshot_name", "model_final", "--num_points", "100",
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    rec = json.loads(out[-1])
    assert "recall" in rec and 0.0 <= rec["recall"] <= 100.0
