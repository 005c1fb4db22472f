"""ctypes bindings for the native host runtime (native/nmpc_rt.cpp).

The C++ layer is the rospy/TCPROS replacement (SURVEY.md §5.8): a seqlock
topic bus with tear-free latching (the reference's benign odom race, made
explicit and safe — §5.2), a UDP transport for real robots, and a
drift-free monotonic rate keeper replacing time.sleep(T) pacing.

The shared library is built on first use with g++ (no pybind11 needed).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "build" / "libnmpc_rt.so"
_lock = threading.Lock()
_lib = None


def ensure_built() -> ctypes.CDLL:
    """Build (if needed) and load the native runtime."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not _SO_PATH.exists() or (
            _SO_PATH.stat().st_mtime < (_NATIVE_DIR / "nmpc_rt.cpp").stat().st_mtime
        ):
            subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True)
        lib = ctypes.CDLL(str(_SO_PATH))
        lib.nmpc_bus_create.restype = ctypes.c_void_p
        lib.nmpc_bus_create.argtypes = [ctypes.c_int]
        lib.nmpc_bus_destroy.argtypes = [ctypes.c_void_p]
        lib.nmpc_bus_publish.restype = ctypes.c_int
        lib.nmpc_bus_publish.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.nmpc_bus_latch.restype = ctypes.c_int
        lib.nmpc_bus_latch.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
        ]
        lib.nmpc_udp_pub_open.restype = ctypes.c_int
        lib.nmpc_udp_pub_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.nmpc_udp_send.restype = ctypes.c_int
        lib.nmpc_udp_send.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ]
        lib.nmpc_udp_close.argtypes = [ctypes.c_int]
        lib.nmpc_udp_sub_open.restype = ctypes.c_void_p
        lib.nmpc_udp_sub_open.argtypes = [ctypes.c_int, ctypes.c_void_p]
        lib.nmpc_udp_sub_received.restype = ctypes.c_uint64
        lib.nmpc_udp_sub_received.argtypes = [ctypes.c_void_p]
        lib.nmpc_udp_sub_close.argtypes = [ctypes.c_void_p]
        lib.nmpc_rate_create.restype = ctypes.c_void_p
        lib.nmpc_rate_create.argtypes = [ctypes.c_double]
        lib.nmpc_rate_sleep.restype = ctypes.c_uint64
        lib.nmpc_rate_sleep.argtypes = [ctypes.c_void_p]
        lib.nmpc_rate_destroy.argtypes = [ctypes.c_void_p]
        lib.nmpc_now_ns.restype = ctypes.c_uint64
        _lib = lib
        return lib


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class Bus:
    """Latched topic bus: one slot of up-to-64 doubles per topic id."""

    def __init__(self, num_topics: int):
        self._lib = ensure_built()
        self._h = self._lib.nmpc_bus_create(num_topics)
        self.num_topics = num_topics

    def publish(self, topic: int, values) -> None:
        a = np.ascontiguousarray(values, dtype=np.float64).reshape(-1)
        rc = self._lib.nmpc_bus_publish(self._h, topic, _dptr(a), a.size)
        if rc != 0:
            raise ValueError(f"publish failed (topic {topic}, n={a.size})")

    def latch(self, topic: int, count: int):
        """Tear-free read of the latest value; returns (array|None, stamp_ns)."""
        out = np.empty(count, np.float64)
        stamp = ctypes.c_uint64(0)
        n = self._lib.nmpc_bus_latch(self._h, topic, _dptr(out), count,
                                     ctypes.byref(stamp))
        if n < 0:
            raise RuntimeError(f"latch failed rc={n}")
        if n == 0:
            return None, 0
        return out[:n], stamp.value

    def close(self):
        if self._h:
            self._lib.nmpc_bus_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class UdpPublisher:
    def __init__(self, host: str, port: int):
        self._lib = ensure_built()
        self._fd = self._lib.nmpc_udp_pub_open(host.encode(), port)
        if self._fd < 0:
            raise OSError(f"udp pub open failed {host}:{port}")

    def send(self, topic: int, values) -> None:
        a = np.ascontiguousarray(values, dtype=np.float64).reshape(-1)
        if self._lib.nmpc_udp_send(self._fd, topic, _dptr(a), a.size) != 0:
            raise OSError("udp send failed")

    def close(self):
        if self._fd >= 0:
            self._lib.nmpc_udp_close(self._fd)
            self._fd = -1


class UdpSubscriber:
    """Background receiver latching datagrams into a Bus."""

    def __init__(self, port: int, bus: Bus):
        self._lib = ensure_built()
        self._h = self._lib.nmpc_udp_sub_open(port, bus._h)
        if not self._h:
            raise OSError(f"udp sub open failed on port {port}")

    @property
    def received(self) -> int:
        return int(self._lib.nmpc_udp_sub_received(self._h))

    def close(self):
        if self._h:
            self._lib.nmpc_udp_sub_close(self._h)
            self._h = None


class Rate:
    """Absolute-deadline rate keeper (no drift; counts missed deadlines)."""

    def __init__(self, period_s: float):
        self._lib = ensure_built()
        self._h = self._lib.nmpc_rate_create(period_s)

    def sleep(self) -> int:
        return int(self._lib.nmpc_rate_sleep(self._h))

    def close(self):
        if self._h:
            self._lib.nmpc_rate_destroy(self._h)
            self._h = None
