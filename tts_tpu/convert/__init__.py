from .writers import (  # noqa: F401
    write_parler_gguf, write_t5_gguf,
)
