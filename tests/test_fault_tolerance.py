"""Worker-death fault tolerance: the 100 TB claim is not only "spills
instead of dying" (scripts/spill_check.py) but "a killed worker mid-pipeline
is retried and the output is unchanged".  This injects a REAL worker death —
SIGKILL of the worker process from inside a map_batches task, the same
failure class as a lost node — and asserts the flagship's cluster
assignment is byte-identical to the healthy run (Ray retries system
failures by default; determinism makes the retried output comparable)."""

import os

import pyarrow as pa


def _killer_for(flag_path: str):
    """Identity batch fn whose FIRST claimant (cross-process O_EXCL on the
    flag file) SIGKILLs its own worker process mid-task.  The flag is
    created BEFORE the kill, so the retried task sees it and passes."""

    def killer(batch: pa.Table) -> pa.Table:
        import signal

        try:
            fd = os.open(flag_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os.kill(os.getpid(), signal.SIGKILL)
        except FileExistsError:
            pass
        return batch

    return killer


class TestWorkerDeath:
    def test_flagship_survives_worker_sigkill(self, ray_session, tmp_path):
        import ray.data as rd

        from dynaalign_ray.config import DedupConfig
        from dynaalign_ray.fixtures import generate_pages
        from dynaalign_ray.pipelines.neardup import near_dedup

        pages, _ = generate_pages(800, seed=3)
        cfg = DedupConfig()
        clean = {
            r["doc_id"]: r["cluster_id"]
            for r in near_dedup(
                pages_ds=rd.from_arrow(pages), cfg=cfg, num_partitions=4
            ).clusters.take_all()
        }

        flag = str(tmp_path / "worker_killed.flag")
        wounded = rd.from_arrow(pages).map_batches(
            _killer_for(flag), batch_format="pyarrow", zero_copy_batch=True
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in near_dedup(
                pages_ds=wounded, cfg=cfg, num_partitions=4
            ).clusters.take_all()
        }
        assert os.path.exists(flag), "kill was never injected"
        assert got == clean
