"""TensorBoard event-file writer: TFRecord framing + protobuf encoding
round trip, crc verification, and runner integration via
`train.tensorboard = true` (observability parity with the reference's
SummaryWriter, exp_runner.py:128, :244-251)."""

import glob
import json
import os
import struct

import numpy as np

from honerf_tpu.utils.tbevents import (
    TBEventWriter,
    _masked_crc,
    crc32c,
    read_events,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(bytes(range(32))) == 0x46DD794E
    assert crc32c(b"123456789") == 0xE3069283


def test_writer_reader_round_trip(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.add_scalars(1, {"Loss/loss": 0.5, "Statistics/psnr": 31.25})
    w.add_scalars(2, {"Loss/loss": 0.25})
    w.close()
    events = read_events(w.path)
    assert events[0][0] == 1
    np.testing.assert_allclose(events[0][1]["Loss/loss"], 0.5)
    np.testing.assert_allclose(events[0][1]["Statistics/psnr"], 31.25)
    assert events[1] == (2, {"Loss/loss": 0.25})


def test_file_version_header(tmp_path):
    w = TBEventWriter(str(tmp_path))
    w.close()
    with open(w.path, "rb") as f:
        data = f.read()
    (ln,) = struct.unpack_from("<Q", data, 0)
    payload = data[12:12 + ln]
    assert b"brain.Event:2" in payload
    (pcrc,) = struct.unpack_from("<I", data, 12 + ln)
    assert pcrc == _masked_crc(payload)


def test_runner_writes_tb_events(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_runner_cli import SMALL_CONF

    from honerf_tpu.data.synthetic import generate_object_dataset
    from honerf_tpu.train.runner import OfflineRunner

    ws = str(tmp_path)
    data_dir = os.path.join(ws, "data")
    generate_object_dataset(data_dir, n_views=4, H=48, W=56)
    conf = os.path.join(ws, "tb.conf")
    with open(conf, "w") as f:
        f.write(
            SMALL_CONF.format(exp_dir=os.path.join(ws, "exp"),
                              data_dir=data_dir)
            .replace("end_iter = 12", "end_iter = 4")
            .replace("refine_pose = True",
                     "refine_pose = True\n    tensorboard = true")
        )
    runner = OfflineRunner(conf, mode="train")
    runner.train()
    files = glob.glob(os.path.join(ws, "exp", "logs", "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])
    assert [s for s, _ in events] == [1, 2, 3, 4]
    # tag set matches the reference SummaryWriter's (exp_runner.py:244-251)
    tags = set(events[0][1])
    assert {"Loss/loss", "Loss/color_loss", "Loss/mask_loss",
            "Loss/eikonal_loss", "Statistics/psnr"} <= tags
    # values agree with the JSONL stream
    recs = [json.loads(l) for l in
            open(os.path.join(ws, "exp", "logs", "metrics.jsonl"))]
    np.testing.assert_allclose(
        events[0][1]["Loss/loss"], recs[0]["loss"], rtol=1e-6
    )
