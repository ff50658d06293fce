"""Weight-backup cascade (`ref:src/run_recbole.py:117-166`): GCS → NFS →
local-only-as-fallback ordering, per-medium wandb logging, and the alert
when every leg fails. GCS is exercised through a mocked uploader (the
build environment has zero egress)."""

import os

import pytest

import oovrec_tpu.cli.run as run_mod
from oovrec_tpu.cli.run import backup_weights


class FakeWandb:
    def __init__(self):
        self.logged = []
        self.alerts = []

    def log_raw(self, payload, commit=True):
        self.logged.append(payload)

    def alert(self, title, text):
        self.alerts.append((title, text))


@pytest.fixture
def weight_file(tmp_path):
    p = tmp_path / "model.ckpt"
    p.write_bytes(b"weights")
    return str(p)


def test_nfs_leg_copies_and_logs_medium(tmp_path, weight_file):
    nfs = tmp_path / "nfs"
    w = FakeWandb()
    media = backup_weights(
        [weight_file], config={"dataset": "d"}, nfs_path=str(nfs),
        wandb_logger=w,
    )
    assert media == ["nfs"]
    assert (nfs / "model.ckpt").read_bytes() == b"weights"
    assert {"file_backup_medium": "nfs"} in w.logged
    assert not w.alerts


def test_gcs_leg_runs_first_and_local_skipped(tmp_path, weight_file,
                                              monkeypatch):
    calls = []
    monkeypatch.setattr(
        run_mod, "_gcs_upload",
        lambda bucket, ds, paths: calls.append((bucket, ds, list(paths))),
    )
    nfs = tmp_path / "nfs"
    w = FakeWandb()
    media = backup_weights(
        [weight_file],
        config={"gcs_bucket_name": "bkt", "dataset": "ml-1m"},
        nfs_path=str(nfs), wandb_logger=w,
    )
    # reference order: GCS then NFS both record; local leg never runs
    # once any medium succeeded (`run_recbole.py:148`)
    assert media == ["gcs", "nfs"]
    assert calls == [("bkt", "ml-1m", [weight_file])]
    assert {"file_backup_medium": "gcs"} in w.logged
    assert not w.alerts


def test_gcs_failure_falls_through_to_nfs(tmp_path, weight_file,
                                          monkeypatch):
    def boom(*a):
        raise RuntimeError("no egress")

    monkeypatch.setattr(run_mod, "_gcs_upload", boom)
    nfs = tmp_path / "nfs"
    media = backup_weights(
        [weight_file],
        config={"gcs_bucket_name": "bkt", "dataset": "d"},
        nfs_path=str(nfs),
    )
    assert media == ["nfs"]
    assert (nfs / "model.ckpt").exists()


def test_local_fallback_when_gcs_and_nfs_fail(tmp_path, weight_file,
                                              monkeypatch):
    def boom(*a):
        raise RuntimeError("no egress")

    monkeypatch.setattr(run_mod, "_gcs_upload", boom)
    monkeypatch.chdir(tmp_path)
    w = FakeWandb()
    # nfs_path points at an uncreatable location (a path under a file)
    blocker = tmp_path / "blocker"
    blocker.write_text("x")
    media = backup_weights(
        [weight_file],
        config={"gcs_bucket_name": "bkt", "dataset": "d"},
        nfs_path=str(blocker / "sub"), wandb_logger=w,
    )
    assert media == ["local"]
    assert os.path.isfile(tmp_path / "saved" / "d" / "model.ckpt")
    assert {"file_backup_medium": "local"} in w.logged
    assert not w.alerts


def test_alert_fires_when_every_leg_fails(tmp_path, weight_file,
                                          monkeypatch):
    def boom(*a):
        raise RuntimeError("no egress")

    monkeypatch.setattr(run_mod, "_gcs_upload", boom)

    def no_mkdir(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(run_mod.os, "makedirs", no_mkdir)
    w = FakeWandb()
    warnings = []
    media = backup_weights(
        [weight_file],
        config={"gcs_bucket_name": "bkt", "dataset": "d"},
        nfs_path=str(tmp_path / "nfs"), wandb_logger=w,
        logger=type("L", (), {"warning": staticmethod(warnings.append)}),
    )
    assert media == []
    assert w.alerts == [
        ("Backup Failure", "Failed to backup to any medium!")
    ]
    assert any("Failed to backup to any medium" in m for m in warnings)


def test_zero_egress_gcs_fast_fails_without_wheel(tmp_path, weight_file):
    # the real _gcs_upload: google-cloud-storage is absent in this image,
    # so the leg raises (ImportError) and the cascade degrades — never
    # hangs, never crashes the run
    media = backup_weights(
        [weight_file],
        config={"gcs_bucket_name": "bkt", "dataset": "d"},
        nfs_path=str(tmp_path / "nfs"),
    )
    assert media == ["nfs"]
