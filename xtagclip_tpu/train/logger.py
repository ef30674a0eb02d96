"""Logging setup: 'time | level | message' console+file, optional hostname
(reference open_clip_train/logger.py:4-26)."""

from __future__ import annotations

import logging


def setup_logging(log_file=None, level=logging.INFO, include_host: bool = False):
    if include_host:
        import socket

        hostname = socket.gethostname()
        formatter = logging.Formatter(
            f"%(asctime)s | {hostname} | %(levelname)s | %(message)s",
            datefmt="%Y-%m-%d,%H:%M:%S",
        )
    else:
        formatter = logging.Formatter(
            "%(asctime)s | %(levelname)s | %(message)s",
            datefmt="%Y-%m-%d,%H:%M:%S",
        )

    logging.root.setLevel(level)
    for logger in [logging.getLogger(n) for n in logging.root.manager.loggerDict]:
        logger.setLevel(level)

    sh = logging.StreamHandler()
    sh.setFormatter(formatter)
    logging.root.addHandler(sh)

    if log_file:
        fh = logging.FileHandler(filename=log_file)
        fh.setFormatter(formatter)
        logging.root.addHandler(fh)


class AverageMeter:
    """Running average (reference open_clip_train/train.py:23-40)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
