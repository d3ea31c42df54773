"""Logging with the reference's exact format (trainer.py:22-24): file
``<out>/log.txt`` + stdout, '[%H:%M:%S.%(msecs)03d] message'. Downstream
parity tooling parses these lines, so the format is part of the API."""

from __future__ import annotations

import logging
import os
import sys


def setup_logging(snapshot_path: str, filename: str = "log.txt") -> None:
    os.makedirs(snapshot_path, exist_ok=True)
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
    logging.basicConfig(
        filename=os.path.join(snapshot_path, filename),
        level=logging.INFO,
        format="[%(asctime)s.%(msecs)03d] %(message)s",
        datefmt="%H:%M:%S",
        force=True,
    )
    root.addHandler(logging.StreamHandler(sys.stdout))


class SummaryWriter:
    """tensorboardX writer with a no-op fallback."""

    def __init__(self, logdir: str):
        try:
            from tensorboardX import SummaryWriter as TBWriter

            self._w = TBWriter(logdir)
        except Exception:
            self._w = None

    def add_scalar(self, tag, value, step):
        if self._w is not None:
            self._w.add_scalar(tag, float(value), step)

    def add_image(self, tag, img, step):
        if self._w is not None:
            self._w.add_image(tag, img, step)

    def close(self):
        if self._w is not None:
            self._w.close()
