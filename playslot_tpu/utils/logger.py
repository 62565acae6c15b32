"""
Experiment file logger.

Capability parity with reference src/lib/logger.py: a global singleton that
tees messages to stdout and `logs.txt` inside the experiment directory, plus
an exception-logging decorator.
"""

import functools
import os
import traceback
from datetime import datetime

_LOGGER = None


class Logger:
    def __init__(self, exp_path, file_name="logs.txt"):
        global _LOGGER
        os.makedirs(exp_path, exist_ok=True)
        self.path = os.path.join(exp_path, file_name)
        # keep the handle open (line-buffered) instead of reopening per
        # message — per-batch logging in tight training loops otherwise pays
        # an open/close syscall pair per line
        self._fh = open(self.path, "a", buffering=1)
        self._fh.write(
            f"\n{'=' * 60}\nNew run {datetime.now().isoformat()}\n{'=' * 60}\n")
        if _LOGGER is not None and getattr(_LOGGER, "_fh", None) is not None:
            _LOGGER._fh.close()
        _LOGGER = self

    def write(self, msg):
        self._fh.write(f"{datetime.now().strftime('%H:%M:%S')}  {msg}\n")


def print_(msg, verbose=True):
    """Print + append to the active experiment log (logger.py:47-55)."""
    if verbose:
        print(msg)
    if _LOGGER is not None:
        _LOGGER.write(str(msg))


def log_function(fn):
    """Decorator: log uncaught exceptions to the experiment log and re-raise."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except Exception:
            print_(f"Exception in {fn.__name__}:\n{traceback.format_exc()}")
            raise

    return wrapper


def log_info(message):
    print_(message)
