"""Process-wide execution engine: compile cache + parameter residency.

The reference keeps one global OpenCL session — platform, queue, program,
kernel, and device buffers — shared by every ``net_fpga`` instance and torn
down when the last instance dies (src/netFPGA.cpp:21-56, 367-441, 613-651).
Its lazy ``_init_program`` / ``_init_kernel`` pair compiles-on-first-use, and
``_load_params`` restages weights only when the resident network's identity
changes (src/netFPGA.cpp:254, 484-515).

The TPU-native mirror:

  * ``_init_program``  -> ``jax.jit`` tracing+compilation, cached per
    (function, shapes, dtypes) — XLA's compile cache is the ``.aocx`` store.
  * ``_init_kernel``   -> :meth:`Engine.compiled`, a named lookup table of
    jitted callables so backends share compilations process-wide.
  * ``_load_params``   -> :class:`ParamStore`, a version-keyed device
    residency cache: ``device_put`` once, restage only when the owning
    backend bumps its version (weight mutation / model swap).
  * ``cleanup()``      -> :meth:`Engine.cleanup` (drops caches; GC replaces
    the reference's manual refcount, SURVEY.md §1 "key architectural
    property").
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Dict, Hashable, Optional, Tuple

import jax


class ParamStore:
    """Device-residency cache for parameter pytrees.

    Keys are ``(owner_key, version)``; a put with a newer version evicts the
    stale entry — the analogue of the reference's pointer-identity restage
    check (src/netFPGA.cpp:254).
    """

    def __init__(self):
        self._store: Dict[Hashable, Tuple[int, Any]] = {}
        self._lock = threading.Lock()

    def get(self, owner_key: Hashable, version: int,
            stage: Callable[[], Any]) -> Any:
        with self._lock:
            hit = self._store.get(owner_key)
            if hit is not None and hit[0] == version:
                return hit[1]
        staged = stage()  # host->HBM transfer outside the lock
        with self._lock:
            self._store[owner_key] = (version, staged)
        return staged

    def evict(self, owner_key: Hashable) -> None:
        with self._lock:
            self._store.pop(owner_key, None)

    def __len__(self) -> int:
        return len(self._store)


class Engine:
    """Singleton runtime session (the reborn global OpenCL session)."""

    _instance: Optional["Engine"] = None
    _instance_lock = threading.Lock()

    def __init__(self):
        self.params = ParamStore()
        self._compiled: Dict[Hashable, Callable] = {}
        self._lock = threading.Lock()

    @classmethod
    def get(cls) -> "Engine":
        with cls._instance_lock:
            if cls._instance is None:
                cls._instance = Engine()
            return cls._instance

    @classmethod
    def cleanup(cls) -> None:
        """Drop the process-wide session (reference ``cleanup()``,
        src/netFPGA.cpp:639-651). A later backend re-inits lazily."""
        with cls._instance_lock:
            cls._instance = None

    def compiled(self, key: Hashable, build: Callable[[], Callable]
                 ) -> Callable:
        """Lazy compile-once lookup (≙ ``_init_program``/``_init_kernel``,
        src/netFPGA.cpp:367-441). ``build`` returns a jitted callable."""
        with self._lock:
            fn = self._compiled.get(key)
            if fn is None:
                fn = build()
                self._compiled[key] = fn
            return fn

    @staticmethod
    def default_device():
        return jax.devices()[0]

    @property
    def n_compiled(self) -> int:
        return len(self._compiled)
