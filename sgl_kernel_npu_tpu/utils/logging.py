"""Package logging subsystem.

Reference parity: python/attentions/attentions/utils/logs/logging.py:34-188 — a
hardened rotating-file logger with env-parsed levels — and deep_ep's
log_parameters debug decorator (python/deep_ep/deep_ep/utils.py:48-113) which
logs full call signatures with rank tags at DEBUG level.
"""

from __future__ import annotations

import functools
import logging
import logging.handlers
import os
import stat

from . import env

_LOGGER_NAME = "sgl_kernel_npu_tpu"
_MAX_BYTES = 10 << 20
_BACKUP_COUNT = 5


def _parse_level(raw: str) -> int:
    return {
        "debug": logging.DEBUG,
        "info": logging.INFO,
        "warning": logging.WARNING,
        "error": logging.ERROR,
        "critical": logging.CRITICAL,
    }.get(raw.strip().lower(), logging.WARNING)


@functools.lru_cache(maxsize=1)
def get_logger() -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(_parse_level(env.env_str("SKT_LOG_LEVEL", "warning")))
    if logger.handlers:
        return logger

    handler: logging.Handler = logging.StreamHandler()
    log_dir = env.env_str("SKT_LOG_DIR", "")
    if log_dir:
        # Hardened file logging: refuse symlinked/world-writable dirs, chmod the
        # file to owner-only (mirrors the reference's permission hardening).
        try:
            if os.path.islink(log_dir):
                raise OSError(f"log dir {log_dir} is a symlink; refusing")
            os.makedirs(log_dir, mode=0o750, exist_ok=True)
            st = os.stat(log_dir)
            if st.st_mode & stat.S_IWOTH:
                raise OSError(f"log dir {log_dir} is world-writable; refusing")
            path = os.path.join(log_dir, f"{_LOGGER_NAME}.log")
            handler = logging.handlers.RotatingFileHandler(
                path, maxBytes=_MAX_BYTES, backupCount=_BACKUP_COUNT
            )
            os.chmod(path, 0o600)
        except OSError as e:  # fall back to stderr, never crash the caller
            handler = logging.StreamHandler()
            logger.warning("file logging disabled: %s", e)

    handler.setFormatter(
        logging.Formatter("[%(asctime)s] [%(levelname)s] [%(process)d] %(name)s: %(message)s")
    )
    logger.addHandler(handler)
    logger.propagate = False
    return logger


def log_parameters(fn):
    """DEBUG-level call-signature logging decorator (ref: deep_ep/utils.py:48-113)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        logger = get_logger()
        if logger.isEnabledFor(logging.DEBUG):
            parts = [repr(a) for a in args] + [f"{k}={v!r}" for k, v in kwargs.items()]
            logger.debug("%s(%s)", fn.__qualname__, ", ".join(parts))
        return fn(*args, **kwargs)

    return wrapper
