"""Running-average meters and the fixed-width table logger.

Behavioral port of the reference's experiment logging (src/utils.jl:27-87):
the logger closure has two modes — record per-step loss components into
named meters, or print an epoch row of explicit columns followed by the
running means of the recorded components.
"""

from __future__ import annotations

from typing import Dict, Sequence


class AverageMeter:
    """Reference: src/utils.jl:28-50."""

    def __init__(self):
        self.last_value = 0.0
        self.sum = 0.0
        self.count = 0

    def reset(self):
        self.last_value = 0.0
        self.sum = 0.0
        self.count = 0
        return self

    def update(self, val: float) -> float:
        val = float(val)
        self.last_value = val
        self.sum += val
        self.count += 1
        return self.sum / self.count

    def __call__(self) -> float:
        return self.sum / self.count if self.count else 0.0


def table_logger(header: Sequence[str], record: Sequence[str] = ()):
    """Returns ``log(last: bool, records: dict, *args)``.

    * ``log(False, {"Total Loss": v, ...})`` accumulates into meters.
    * ``log(False, {}, epoch, nfe, ...)`` prints a row: the positional
      columns then the running means of every recorded component.
    * ``log(True, {})`` prints the closing rule.

    Reference: src/utils.jl:53-87.
    """
    header = list(header)
    record = list(record)
    cols = header + record
    widths = [max(len(h), 12) for h in cols]
    span = sum(w + 3 for w in widths) + 1

    print("=" * span)
    print("| " + " | ".join(h.ljust(w) for h, w in zip(cols, widths)) + " |")
    print("=" * span)

    meters: Dict[str, AverageMeter] = {r: AverageMeter() for r in record}

    def log(last: bool, records: Dict[str, float], *args):
        if records:
            for k, v in records.items():
                meters[k].update(v)
            return
        if last:
            print("=" * span)
            return
        vals = list(args) + [meters[r]() for r in record]
        cells = [f"{float(v):.4f}".rjust(w) for v, w in zip(vals, widths)]
        print("| " + " | ".join(cells) + " |")

    log.meters = meters
    return log
