"""Extract a val trajectory table from a run's TensorBoard event files.

The trainer logs ``val_loss`` / ``val_mAP`` each validation round
(train/trainer.py:515-516) into tensorboardX event files; the evidence
sections in PARITY.md quote those trajectories.  This reads the TFRecord
event stream directly (8-byte length + crc framing, Event protos via
tensorboardX's bundled proto defs) so no TensorBoard install is needed.

    python tools/tb_trajectory.py saved/<run>/version_0 [--steps-per-epoch N]
"""

import argparse
import glob
import os
import struct
import sys

from tensorboardX.proto import event_pb2


def read_events(path):
    """Yield Event protos from one event file (TFRecord framing)."""
    with open(path, "rb") as f:
        while True:
            header = f.read(8)
            if len(header) < 8:
                return
            (length,) = struct.unpack("<Q", header)
            f.read(4)  # length crc
            payload = f.read(length)
            f.read(4)  # payload crc
            if len(payload) < length:
                return
            ev = event_pb2.Event()
            ev.ParseFromString(payload)
            yield ev


def scalars(logdir):
    """tag -> list of (step, value), merged over all event files."""
    out = {}
    for path in sorted(glob.glob(os.path.join(logdir, "events.out.*"))):
        for ev in read_events(path):
            for v in ev.summary.value:
                if v.HasField("simple_value"):
                    out.setdefault(v.tag, []).append(
                        (ev.step, v.simple_value))
    for series in out.values():
        series.sort()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--steps-per-epoch", type=int, default=None,
                    help="annotate rows with epoch = step // N")
    ap.add_argument("--tags", default="val_loss,val_mAP")
    args = ap.parse_args()
    data = scalars(args.logdir)
    tags = args.tags.split(",")
    for t in tags:
        if t not in data:
            print(f"(tag {t!r} not found; have {sorted(data)})",
                  file=sys.stderr)
            return 1
    # dedupe steps (restarted runs / overlapping event files log the same
    # step more than once): one row per step, last-written value wins for
    # every tag -- matching TensorBoard's own display semantics
    base = sorted(dict(data[tags[0]]))
    cols = " | ".join(tags)
    print(f"| step | epoch | {cols} |" if args.steps_per_epoch
          else f"| step | {cols} |")
    by_step = [dict(data[t]) for t in tags]
    for step in base:
        vals = " | ".join(
            f"{d[step]:.4g}" if step in d else "-" for d in by_step)
        if args.steps_per_epoch:
            print(f"| {step} | {step // args.steps_per_epoch} | {vals} |")
        else:
            print(f"| {step} | {vals} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
