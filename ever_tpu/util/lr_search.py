"""LR range-test plotting hook.

Parity: ``ever/util/lr_search.py:4-30`` — pairs with the ``search`` LR
schedule (``ever_tpu/opt/learning_rate.py``) to sweep LR exponentially and
plot loss vs LR; matplotlib is imported lazily and the raw CSV is always
written (headless-safe).
"""

from __future__ import annotations

import csv

from ever_tpu.core.logger import TrainLogHook

__all__ = ['PlotLearningRateAndLoss']


class PlotLearningRateAndLoss(TrainLogHook):
    def __init__(self, save_path: str):
        self.losses = []
        self.lrs = []
        self.save_path = save_path

    def after_iter(self, global_step, loss_dict, learning_rate):
        self.losses.append(float(loss_dict.get('total_loss',
                                               sum(v for k, v in loss_dict.items()
                                                   if k.endswith('loss')))))
        self.lrs.append(float(learning_rate))

    def after_train(self):
        csv_path = self.save_path + '.csv' if not self.save_path.endswith('.csv') \
            else self.save_path
        with open(csv_path, 'w', newline='') as f:
            w = csv.writer(f)
            w.writerow(['lr', 'loss'])
            w.writerows(zip(self.lrs, self.losses))
        try:
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            plt.plot(self.lrs, self.losses)
            plt.xscale('log')
            plt.xlabel('learning rate')
            plt.ylabel('loss')
            fig_path = self.save_path if self.save_path.endswith(('.png', '.pdf')) \
                else self.save_path + '.png'
            plt.savefig(fig_path)
            plt.close()
        except ImportError:
            pass
