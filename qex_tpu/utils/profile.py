"""Hierarchical timer tree with flop accounting.

TPU-native replacement for QEX's src/base/profile.nim (``tic``/``toc``
timer tree with per-kernel flop counting and Gflop/s reporting,
:411-554, ``PerfInfo`` :10-24).

Device-truthful timing on JAX requires a sync at ``toc``; the context
manager fetches a tiny real scalar from the traced value when one is
supplied (the only reliable sync on all backends, including the axon
tunnel where ``block_until_ready`` is a no-op).  Use sparingly around
jitted calls, not inside them; for in-depth kernel profiles use
``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class TimerNode:
    name: str
    nsec: float = 0.0
    flops: float = 0.0
    count: int = 0
    children: dict = field(default_factory=dict)

    def child(self, name: str) -> "TimerNode":
        if name not in self.children:
            self.children[name] = TimerNode(name)
        return self.children[name]


class Profiler:
    """tic/toc tree (QEX profile.nim).  Thread-unsafe by design (the
    reference's is per-thread too)."""

    def __init__(self):
        self.root = TimerNode("total")
        self._stack = [self.root]

    @contextlib.contextmanager
    def timer(self, name: str, flops: float = 0.0, sync=None):
        node = self._stack[-1].child(name)
        self._stack.append(node)
        t0 = time.perf_counter()
        try:
            yield node
        finally:
            if sync is not None:
                _device_sync(sync)
            dt = time.perf_counter() - t0
            node.nsec += dt * 1e9
            node.flops += flops
            node.count += 1
            self._stack.pop()

    def reset(self) -> None:
        """Clear the tree (per-trajectory reporting)."""
        self.root = TimerNode("total")
        self._stack = [self.root]

    def report(self, min_frac: float = 0.001) -> str:
        """Render the tree (QEX echoTimers; drops tiny children like
        DropWasteTimerRatio)."""
        lines = []
        total = sum(c.nsec for c in self.root.children.values()) or 1.0

        def walk(node, depth):
            secs = node.nsec / 1e9
            line = f"{'  ' * depth}{node.name:<30} {secs:10.4f} s"
            line += f"  x{node.count}"
            if node.flops:
                line += f"  {node.flops / node.nsec:8.2f} Gflop/s"
            lines.append(line)
            for c in sorted(node.children.values(), key=lambda c: -c.nsec):
                if c.nsec / total >= min_frac:
                    walk(c, depth + 1)

        for c in sorted(self.root.children.values(), key=lambda c: -c.nsec):
            walk(c, 0)
        return "\n".join(lines)


_sync_fn = None


def _device_sync(x) -> None:
    """Block until ``x`` is computed by fetching ONE real f32 scalar
    derived from it through a jitted reduction — the only reliable
    sync on every backend (on the axon tunnel, eager ops and
    ``block_until_ready`` both fail silently; complex transfers are
    unsupported)."""
    global _sync_fn
    try:
        import jax
        import jax.numpy as jnp
        if _sync_fn is None:
            _sync_fn = jax.jit(
                lambda a: jnp.abs(jnp.real(
                    jnp.asarray(a).ravel()[0])).astype(jnp.float32))
        leaves = jax.tree_util.tree_leaves(x)
        if leaves:
            float(_sync_fn(leaves[0]))
    except Exception:
        pass  # never let profiling break the run


_global = Profiler()


def get_profiler() -> Profiler:
    return _global


def timer(name: str, flops: float = 0.0, sync=None):
    """Module-level tic/toc: ``with timer("cg", flops=n): ...``"""
    return _global.timer(name, flops, sync)


def echo_timers() -> None:
    print(_global.report())
