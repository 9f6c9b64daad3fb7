"""Real multi-process distributed training (2 OS processes, gloo-backed CPU
cluster) — the torchrun analog (``ever/trainer/th_ddp_trainer.py:13-17``).

Runs ``tools/multiprocess_validation.py --launch`` in a subprocess: 2 workers
x 2 fake devices train the full registered-config trainer over one global
mesh; the loss trajectory must equal a single-process run of the same global
schedule, host collectives must agree, and only the main process writes
checkpoints.
"""

import os
import subprocess
import sys

import pytest


@pytest.mark.timeout(600)
def test_two_process_training_matches_single_process():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tool = os.path.join(repo, 'tools', 'multiprocess_validation.py')
    env = dict(os.environ)
    # the tool manages its own device counts / platforms
    env.pop('XLA_FLAGS', None)
    proc = subprocess.run([sys.executable, tool, '--launch'],
                          capture_output=True, text=True, timeout=570,
                          env=env)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert 'MULTIPROCESS VALIDATION OK' in proc.stdout


@pytest.mark.timeout(1200)
def test_four_process_hybrid_zero_resume_matches_single_process():
    """VERDICT r2 #6 — the pod proxy: 4 processes x 2 devices over a hybrid
    (data x model) mesh, ZeRO-1 optimizer sharding across the process-
    spanning axis, collective orbax save -> process exit -> resume in fresh
    processes, plus the full trainer at 4 processes with uneven (3/2/2/2)
    distributed-eval partitions.  Stitched trajectories must equal the
    single-process 8-device runs."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tool = os.path.join(repo, 'tools', 'multiprocess_validation.py')
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    proc = subprocess.run([sys.executable, tool, '--launch-hybrid'],
                          capture_output=True, text=True, timeout=1150,
                          env=env)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert 'HYBRID MULTIPROCESS VALIDATION OK' in proc.stdout
