"""Loader registry: architecture -> runner factory.

Parity: reference src/models/loaders.{h,cpp} (`LOADERS` static map +
`runner_from_file`). The `test:` filename prefix instantiates weight-free
test runners (loaders.cpp:37-44).
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

from ..common import GenerationConfig
from ..gguf.reader import GGUFReader
from .base import TTSRunner

_LOADERS: Dict[str, Callable] = {}
_TEST_LOADERS: Dict[str, Callable] = {}


def register(arch: str, loader: Callable, test: bool = False) -> None:
    (_TEST_LOADERS if test else _LOADERS)[arch] = loader


def _ensure_builtin() -> None:
    # Imports are deferred so `import tts_tpu` stays light.
    if _TEST_LOADERS.get("dummy") is None:
        from .dummy import DummyRunner
        register("dummy", lambda config: DummyRunner(), test=True)
    if "parler-tts" not in _LOADERS:
        from .parler.loader import load_parler_runner
        register("parler-tts", load_parler_runner)
    if "kokoro" not in _LOADERS:
        try:
            from .kokoro.loader import load_kokoro_runner
            register("kokoro", load_kokoro_runner)
        except ImportError:
            pass
    if "dia" not in _LOADERS:
        try:
            from .dia.loader import load_dia_runner
            register("dia", load_dia_runner)
        except ImportError:
            pass
    if "orpheus" not in _LOADERS:
        try:
            from .orpheus.loader import load_orpheus_runner
            register("orpheus", load_orpheus_runner)
        except ImportError:
            pass


def runner_from_file(fname: str, config: Optional[GenerationConfig] = None,
                     **kw) -> TTSRunner:
    """Load a model file (or `test:<arch>`) and return its runner.

    Parity: reference `runner_from_file` (loaders.cpp:34-95). n_threads /
    cpu_only have no TPU equivalent; extra kwargs are passed to the loader.
    """
    _ensure_builtin()
    config = config or GenerationConfig()
    if fname.startswith("test:"):
        name = fname[len("test:"):]
        if name not in _TEST_LOADERS:
            raise ValueError(f"unknown test model {name!r}")
        return _TEST_LOADERS[name](config)
    reader = GGUFReader(fname)
    arch = reader.architecture
    if arch not in _LOADERS:
        raise ValueError(f"unsupported architecture {arch!r} in {fname}")
    return _LOADERS[arch](reader, config, **kw)
