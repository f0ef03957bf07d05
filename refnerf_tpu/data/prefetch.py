"""Host->device batch pipeline.

The reference produces batches synchronously inside torch DataLoader workers
(its threaded prefetch was abandoned; ref: datasets.py:270,345-370). Here the
pipeline is a background thread sampling numpy batches plus an async
device_put queue, so host sampling and H2D transfer overlap device compute -
the train loop only ever blocks if the device outruns the (cheap, integer-id)
host sampler.
"""

from __future__ import annotations

import queue
import threading
import jax

from refnerf_tpu.parallel import mesh as mesh_lib

# Queue sentinel: the producer thread is done (source exhausted or errored).
_DONE = object()


def device_prefetch(iterator, mesh=None, buffer_size: int = 2):
  """Yield batches already device_put (sharded over `mesh` if given).

  jax.device_put is async: by enqueueing `buffer_size` batches ahead, the
  transfer of batch N+1 overlaps the compute of batch N. Closing the
  generator closes the underlying iterator (stops a ThreadedSampler's
  thread).
  """
  sharding = mesh_lib.batch_sharding(mesh) if mesh is not None else None

  def put(batch):
    if sharding is None:
      return jax.tree_util.tree_map(jax.device_put, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)

  try:
    buf = []
    for batch in iterator:
      buf.append(put(batch))
      if len(buf) >= buffer_size:
        yield buf.pop(0)
    while buf:
      yield buf.pop(0)
  finally:
    close = getattr(iterator, 'close', None)
    if close is not None:
      close()


class ThreadedSampler:
  """Run a dataset's batch sampling on a background thread.

  A bounded queue of host batches; the main thread pops, device_puts, and
  steps. Sampling integer pixel ids is cheap, but decoupling it removes the
  per-step host hiccup entirely.

  The producer signals exhaustion AND errors through the queue: a dataset
  exception re-raises in the consumer (instead of the consumer deadlocking
  on a dead producer), and a finite source ends with StopIteration. close()
  stops the thread; the device_prefetch wrapper calls it when the consumer
  generator is closed or garbage-collected.
  """

  def __init__(self, dataset, capacity: int = 3):
    self._dataset = dataset
    self._queue: queue.Queue = queue.Queue(capacity)
    self._stop = threading.Event()
    self._thread = threading.Thread(target=self._run, daemon=True)
    self._thread.start()

  def _put(self, item) -> bool:
    """Blocking put that aborts on close(); True if enqueued."""
    while not self._stop.is_set():
      try:
        self._queue.put(item, timeout=0.1)
        return True
      except queue.Full:
        continue
    return False

  def _run(self):
    while not self._stop.is_set():
      try:
        batch = next(self._dataset)
      except StopIteration:
        self._put(_DONE)
        return
      except BaseException as e:  # noqa: BLE001 - relayed to the consumer
        self._put((_DONE, e))
        return
      if not self._put(batch):
        return

  def __iter__(self):
    return self

  def __next__(self):
    if self._stop.is_set():
      raise StopIteration
    item = self._queue.get()
    if item is _DONE:
      self._stop.set()
      raise StopIteration
    if isinstance(item, tuple) and len(item) == 2 and item[0] is _DONE:
      self._stop.set()
      raise item[1]
    return item

  def close(self):
    self._stop.set()


def training_batches(dataset, mesh=None, threaded: bool = True,
                     buffer_size: int = 2):
  """The standard train input pipeline: threaded sampling + device prefetch.

  The returned generator owns the sampler thread: `.close()` it (or let it
  be garbage-collected) to stop background sampling; exhausting it (finite
  sources) stops the thread automatically.
  """
  source = ThreadedSampler(dataset) if threaded else dataset
  return device_prefetch(source, mesh=mesh, buffer_size=buffer_size)
