"""Preemption-safe training.

TPU VMs (and spot/preemptible instances generally) receive SIGTERM with a
short grace window before the machine disappears. The serving stack
already drains on SIGTERM (serve/ipc.py); this is the training analogue:
catch the signal, finish the in-flight step, write a collective
checkpoint, and exit cleanly so ``--resume`` continues exactly where the
run stopped. The reference has no counterpart (optimized_train.py only
saves every ``save_every`` epochs and cannot resume at all) — "TPU-first"
means surviving TPU preemption.

Semantics by topology:
- single process: the train loop checks the flag after EVERY step and
  writes a mid-epoch checkpoint carrying the exact step/rng position plus
  ``epoch_step`` (steps completed this epoch), so resume replays the
  interrupted epoch from the next batch — bitwise-identical to an
  uninterrupted run (the loaders are per-epoch seeded and per-step
  randomness threads through ``TrainState.rng``);
- multi-host: a signal may land on ONE host only, and the checkpoint
  write is collective, so the decision must be host-uniform —
  ``preemption_agreed`` allgathers the local flags once per epoch and
  every host stops together at the epoch boundary.
"""

from __future__ import annotations

import signal

import numpy as np

import jax


class PreemptionGuard:
    """Installs SIGTERM/SIGINT handlers that set ``triggered`` instead of
    killing the process; restores the previous handlers on exit.

    Safe to construct anywhere; installation only succeeds in the main
    thread (``signal.signal`` raises elsewhere — the guard then stays
    inert, which is correct: a worker thread cannot own process signals).
    A second SIGINT while already triggered raises ``KeyboardInterrupt``:
    an operator pressing Ctrl-C twice wants OUT, not another checkpoint.
    """

    SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self, signals=SIGNALS):
        self._signals = signals
        self._prev: dict = {}
        self.triggered = False
        # set by the train loop when it actually writes the preemption
        # checkpoint. A signal can land where no checkpoint follows (e.g.
        # during the early-stopping epoch's teardown, after the loop already
        # broke via the patience path) — callers deciding "skip the final
        # artifacts and point the user at preempt_checkpoint" must check
        # THIS, not `triggered`, or they exit 0 advertising a resume path
        # that does not exist
        self.preempt_checkpoint: str | None = None

    def _handle(self, signum, frame):
        if self.triggered and signum == signal.SIGINT:
            raise KeyboardInterrupt
        self.triggered = True

    def __enter__(self):
        try:
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._handle)
        except ValueError:  # not the main thread: stay inert
            for s, h in self._prev.items():
                signal.signal(s, h)
            self._prev.clear()
        return self

    def __exit__(self, *exc):
        for s, h in self._prev.items():
            signal.signal(s, h)
        self._prev.clear()
        return False


def preemption_agreed(local: bool) -> bool:
    """Host-uniform preemption decision: True everywhere if ANY host saw a
    signal. One tiny allgather per call (the train loop calls it once per
    epoch) — a per-step collective would serialize the dispatch pipeline.
    """
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([1.0 if local else 0.0]))
    return bool(np.max(flags) > 0.0)
