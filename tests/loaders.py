"""Shared test loader over fixed arrays — ONE implementation so the batch
arithmetic (drop-last vs min-one-batch vs ragged-tail) can't silently
drift between test modules."""

from __future__ import annotations


class ArrayLoader:
    """Minimal loader over fixed NHWC arrays.

    - default: drop-last semantics (``len = n // batch_size``);
    - ``min_one_batch=True``: always yields at least one (possibly short)
      batch — sweeps need a batch even when batch_size > n;
    - ``ragged_tail=True``: also yields the final short batch (exercises
      padded/masked validation paths).
    """

    def __init__(self, x, y, batch_size, *, min_one_batch: bool = False,
                 ragged_tail: bool = False):
        if len(x) == 0 and min_one_batch:
            # min_one_batch would otherwise yield a zero-length batch and
            # fail deep inside XLA instead of at the loader (an empty
            # loader WITHOUT it is legitimate: e.g. the no-validation-data
            # path, which iterates zero batches)
            raise ValueError("ArrayLoader(min_one_batch) needs >=1 sample")
        self.x, self.y, self.batch_size = x, y, batch_size
        self.min_one_batch = min_one_batch
        self.ragged_tail = ragged_tail

    def __len__(self):
        if self.ragged_tail:
            return -(-len(self.x) // self.batch_size)
        n = len(self.x) // self.batch_size
        return max(1, n) if self.min_one_batch else n

    @property
    def num_samples(self):
        return len(self.x)

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        for i in range(len(self)):
            s = slice(i * self.batch_size, (i + 1) * self.batch_size)
            yield self.x[s], self.y[s]
