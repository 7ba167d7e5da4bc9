"""Console metering (reference gill/utils.py:176-249).

Under SPMD the train-step metrics are already global (GSPMD reduces across
the mesh inside the compiled step), so the reference's meter.all_reduce
(utils.py:225-230) is only needed across *hosts*; `all_reduce()` uses
jax.multihost_utils when world_size > 1 and is a no-op single-host.
"""

from __future__ import annotations

import enum
from typing import List


class Summary(enum.Enum):
    NONE = 0
    AVERAGE = 1
    SUM = 2
    COUNT = 3


class AverageMeter:
    def __init__(self, name: str, fmt: str = ":f",
                 summary_type: Summary = Summary.AVERAGE):
        self.name, self.fmt, self.summary_type = name, fmt, summary_type
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0.0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def all_reduce(self):
        import jax

        if jax.process_count() > 1:  # pragma: no cover - multi-host only
            from jax.experimental import multihost_utils
            import numpy as np

            total = multihost_utils.process_allgather(
                np.asarray([self.sum, self.count]))
            self.sum, self.count = total.sum(axis=0).tolist()
            self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        fmtstr = "{name} {val" + self.fmt + "} ({avg" + self.fmt + "})"
        return fmtstr.format(**self.__dict__)

    def summary(self):
        if self.summary_type is Summary.NONE:
            return ""
        key = {Summary.AVERAGE: "avg", Summary.SUM: "sum",
               Summary.COUNT: "count"}[self.summary_type]
        return f"{self.name} {getattr(self, key):.3f}"


class ProgressMeter:
    def __init__(self, num_batches: int, meters: List[AverageMeter],
                 prefix: str = ""):
        nd = len(str(num_batches))
        self.batch_fmtstr = "[{:" + str(nd) + "d}/" + str(num_batches) + "]"
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        print("\t".join(entries), flush=True)

    def display_summary(self):
        print(" ".join([" *"] + [m.summary() for m in self.meters]), flush=True)
