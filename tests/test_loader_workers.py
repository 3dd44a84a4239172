"""BatchLoader process workers + prefetch-side transfer.

The reference's data layer is a separate multiprocessing.Process feeding a
Queue (ref lib/model/data_layer_generator.py:22-135); BatchLoader(workers=N)
is the equivalent: the parent samples every task from the checkpointed rng,
spawned workers assemble numpy batches, and a collector reorders them — so
the stream is bit-identical to serial assembly, in order, regardless of N.
"""

import numpy as np
import pytest

from faster_rcnn_pytorch_multimodal_tpu.config import cfg_from_list, default_config
from faster_rcnn_pytorch_multimodal_tpu.data import BatchLoader, SyntheticDataset


def _cfg():
    return cfg_from_list(
        default_config(),
        ("NET_TYPE", "image", "NET_VARIANT", "res18",
         "STATIC.MAX_GT", "8", "PIXEL_STDDEVS", "[60.,60.,60.]"),
    )


def _collect(loader, n):
    out = [loader.next() for _ in range(n)]
    loader.kill()
    return out


def test_worker_batches_match_serial():
    cfg = _cfg()
    ds = SyntheticDataset(cfg, num_frames=12, num_classes=2, image_hw=(64, 96))

    serial = BatchLoader(ds, cfg, batch_size=2, seed=7)
    expect = [serial._build_batch(serial._sample_task()) for _ in range(6)]

    mp_loader = BatchLoader(ds, cfg, batch_size=2, seed=7, workers=2)
    mp_loader.start()
    got = _collect(mp_loader, 6)

    for i, (e, g) in enumerate(zip(expect, got)):
        assert set(e.keys()) == set(g.keys()), i
        for k in e:
            np.testing.assert_array_equal(
                np.asarray(e[k]), np.asarray(g[k]), err_msg=f"batch {i} key {k}"
            )


def test_transfer_callback_runs_in_pipeline():
    cfg = _cfg()
    ds = SyntheticDataset(cfg, num_frames=6, num_classes=2, image_hw=(64, 96))
    loader = BatchLoader(ds, cfg, batch_size=2, seed=1)
    tagged = []

    def transfer(batch):
        tagged.append(True)
        return {**batch, "tag": np.int32(len(tagged))}

    loader.start(transfer=transfer)
    b = loader.next()
    loader.kill()
    assert "tag" in b and tagged


def test_thread_prefetch_stream_matches_serial():
    """The task-based sampling refactor must not change the serial
    stream: a prefetching loader and a fresh same-seed loader produce
    identical batches (the resume-determinism contract)."""
    cfg = _cfg()
    ds = SyntheticDataset(cfg, num_frames=10, num_classes=2, image_hw=(64, 96))
    a = BatchLoader(ds, cfg, batch_size=2, seed=3)
    expect = [a._build_batch(a._sample_task()) for _ in range(4)]
    b = BatchLoader(ds, cfg, batch_size=2, seed=3)
    b.start()
    got = _collect(b, 4)
    for e, g in zip(expect, got):
        np.testing.assert_array_equal(e["data"], g["data"])
        np.testing.assert_array_equal(e["gt_boxes"], g["gt_boxes"])
