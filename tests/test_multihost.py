"""Multi-host scale-out: init_distributed wiring + work striping.

jax.distributed needs real multiple processes; the initialize call is
mocked so the wiring (CLI flags -> initialize args -> shard defaults) is
exercised without a pod (VERDICT r1 item #8).
"""
import numpy as np
import pytest

import jax

from innfer_tpu.parallel import multihost


class TestInitDistributed:
    def test_initialize_called_with_args(self, monkeypatch):
        calls = {}

        def fake_init(coordinator_address=None, num_processes=None,
                      process_id=None):
            calls.update(coordinator=coordinator_address,
                         num=num_processes, pid=process_id)

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        rank, world = multihost.init_distributed("10.0.0.1:1234", 2, 1)
        assert calls == {"coordinator": "10.0.0.1:1234", "num": 2, "pid": 1}
        # mocked init leaves this a single-process runtime
        assert (rank, world) == (0, 1)

    def test_single_process_skips_initialize(self, monkeypatch):
        def boom(**kw):
            raise AssertionError("initialize must not be called")

        monkeypatch.setattr(jax.distributed, "initialize", boom)
        assert multihost.init_distributed(None, None, None) == (0, 1)
        assert multihost.init_distributed(None, 1, 0) == (0, 1)

    def test_cli_flags_reach_initialize(self, monkeypatch, tmp_path):
        import cv2

        from innfer_tpu import cli

        calls = {}

        def fake_init(coordinator_address=None, num_processes=None,
                      process_id=None):
            calls.update(coordinator=coordinator_address,
                         num=num_processes, pid=process_id)

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        inp, out = tmp_path / "in", tmp_path / "out"
        inp.mkdir()
        for name in ("a.png", "b.png", "c.png"):
            cv2.imwrite(str(inp / name),
                        np.random.default_rng(0).integers(
                            0, 255, (16, 16, 3)).astype(np.uint8))
        import os.path as osp

        goldens = osp.join(osp.dirname(__file__), "goldens")
        rc = cli.main([
            "-m", osp.join(goldens, "esrgan_x2.pth"),
            "-i", str(inp), "-o", str(out), "-cpu", "-no_fp16",
            "--tile-mode", "none",
            "--coordinator", "host0:9999", "--num-processes", "2",
            "--process-id", "1", "--num-shards", "2", "--shard-index", "1",
        ])
        assert rc == 0
        assert calls == {"coordinator": "host0:9999", "num": 2, "pid": 1}
        # shard 1 of 2 over a sorted 3-image list -> exactly one output
        import os

        assert sorted(os.listdir(out)) == ["b.png"]


class TestShardPaths:
    def test_striping_partitions(self):
        paths = [f"{i:03d}.png" for i in range(10)]
        shards = [multihost.shard_paths(paths, i, 3) for i in range(3)]
        assert sorted(sum(shards, [])) == paths
        assert all(len(s) in (3, 4) for s in shards)

    def test_bad_index_raises(self):
        with pytest.raises(ValueError):
            multihost.shard_paths(["a"], 2, 2)
