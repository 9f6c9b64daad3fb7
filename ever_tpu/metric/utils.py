"""Score tracking across evaluations.

Parity: ``ever/metric/utils.py:7-42`` (wandb/pandas optional here).
"""

from __future__ import annotations

import csv

from ever_tpu.core.dist import main_process_only

__all__ = ['ScoreTracker']


class ScoreTracker:
    def __init__(self):
        self._data = {'step': []}

    def append(self, scores: dict, step) -> None:
        self._data['step'].append(step)
        for k, v in scores.items():
            self._data.setdefault(k, []).append(v)
        try:
            import wandb
            if wandb.run is not None:
                wandb.log(scores, step=step)
        except ImportError:
            pass

    @property
    def scores(self) -> dict:
        return self._data

    @main_process_only
    def to_csv(self, path: str) -> None:
        keys = list(self._data)
        with open(path, 'w', newline='') as f:
            w = csv.writer(f)
            w.writerow(keys)
            for i in range(len(self)):
                w.writerow([self._data[k][i] for k in keys])

    def highest_score(self, name: str) -> dict:
        if len(self) == 0:
            return {'step': -1, name: float('-inf')}
        idx = self._data[name].index(max(self._data[name]))
        return {k: v[idx] for k, v in self._data.items()}

    def lowest_score(self, name: str) -> dict:
        if len(self) == 0:
            return {'step': -1, name: float('inf')}
        idx = self._data[name].index(min(self._data[name]))
        return {k: v[idx] for k, v in self._data.items()}

    def __len__(self) -> int:
        return len(self._data['step'])
