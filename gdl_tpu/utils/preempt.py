"""Preemption-safe training: catch SIGTERM, checkpoint at the next step
boundary, resume exactly mid-epoch.

The reference cannot resume at all (SURVEY §5.3 — best-only checkpoints,
no optimizer-state reload); this framework's epoch-granular --save_every /
--resume landed in round 2. On TPU fleets the missing piece is
*preemption*: the scheduler sends SIGTERM with a short grace window, which
is usually far smaller than an epoch. The guard below turns that signal
into a clean stop at the next STEP boundary, after which the loop saves a
resume state carrying `step_in_epoch` — and the resumed run replays the
remainder of the interrupted epoch exactly:

- device RNG streams key off the GLOBAL step counter
  (`fold_in(base_rng, state.step)`, train/dgl.py / train/joint.py), which
  the checkpoint carries;
- host augmentation draws are per-(seed, epoch, sample-index)
  (data/datasets.py) — independent of which batches were already consumed;
- the shuffle order is per-epoch deterministic (Loader.set_epoch), so
  skipping the first k batch index groups re-enters the same stream.

tests/test_preempt.py proves bitwise continuous-vs-preempted-and-resumed
equality.

Multi-host: every process must stop at the SAME step or the survivors hang
in the next collective. A local flag (each host gets its own SIGTERM from
the scheduler) is therefore only acted on at an agreement boundary: every
`sync_every` steps the hosts allgather their local flags and stop iff any
host flagged; a flag raised in the final partial window is caught by the
epoch-end `agree()` check (run_training calls it before eval), so the stop
is never deferred past a full extra epoch. Single-process runs stop
immediately.

Cost note (ADVICE r4): the multi-host agreement is a BLOCKING host-side
process_allgather — it drains the async dispatch pipeline the train loop
otherwise preserves. At the default sync_every=32 that is one pipeline
drain per ~0.7-2.7 s of stepping (22-83 ms steps), <1% overhead; for very
fast steps raise `--preempt_sync_every`. Single-process runs pay nothing
(the check is a local Event read).
"""

from __future__ import annotations

import signal
import threading
from typing import Optional


class PreemptionGuard:
    """Cooperative stop flag checked once per train step (a host-side
    Event read — zero device cost).

    `trigger_after` is a test hook: should_stop() flags itself once
    `step_count` reaches that value, exercising the exact save/resume path
    without delivering a real signal.
    """

    def __init__(self, sync_every: int = 32,
                 trigger_after: Optional[int] = None):
        self._event = threading.Event()
        self.sync_every = max(1, sync_every)
        self.trigger_after = trigger_after
        self._previous = {}  # signum -> previous handler (install/uninstall)

    # -- flag -------------------------------------------------------------
    def trigger(self, *_args) -> None:
        self._event.set()

    def triggered(self) -> bool:
        return self._event.is_set()

    # -- signal handlers ----------------------------------------------------
    def install(self, signals=(signal.SIGTERM,)) -> "PreemptionGuard":
        """Route `signals` to trigger(). No-op off the main thread (jit
        worker threads, pytest-xdist) — the guard still works via
        trigger()/trigger_after."""
        for s in signals:
            try:
                self._previous[s] = signal.signal(s, self.trigger)
            except ValueError:  # not the main thread
                pass
        return self

    def uninstall(self) -> None:
        for s, prev in self._previous.items():
            try:
                signal.signal(s, prev)
            except ValueError:
                pass
        self._previous.clear()

    # -- the per-step check -------------------------------------------------
    def should_stop(self, step_count: int) -> bool:
        """True when training must stop AFTER the step just completed.
        `step_count` is 1-based within the epoch (skipped batches of a
        resumed epoch excluded — agreement only needs all hosts to count
        identically, which they do by construction)."""
        if (self.trigger_after is not None
                and step_count >= self.trigger_after):
            self.trigger()
        import jax

        if jax.process_count() == 1:
            return self.triggered()
        # multi-host: stop only at agreed boundaries
        if step_count % self.sync_every:
            return False
        return self.agree()

    def agree(self) -> bool:
        """Unconditional agreement check: True iff ANY host has flagged.
        Called by should_stop at sync boundaries and by run_training at
        each epoch end, so a flag raised inside the final partial
        sync_every window still saves before the next epoch's eval runs
        (ADVICE r4) instead of waiting out a scheduler grace window."""
        import jax

        if jax.process_count() == 1:
            return self.triggered()
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.int32(self.triggered()))
        return bool(np.any(flags))
