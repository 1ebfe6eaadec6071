"""Minimal stand-in for the `gguf` python package (not installed in this
environment), backed by tts_tpu's own GGUF writer.

Lets the test suite drive the REFERENCE's own converter code
(/root/reference/py-gguf/tts_encoders/*.py) unmodified: the reference
encoders do all tensor naming/transform/metadata work; this shim only
supplies the llama.cpp `gguf.GGUFWriter` API surface they call and emits a
real GGUF v3 file through tts_tpu.gguf.writer. Key naming for the helper
methods follows the upstream gguf-py constants (e.g. add_context_length ->
"{arch}.context_length", add_head_count -> "{arch}.attention.head_count",
token lists -> "tokenizer.ggml.*") so the produced files match what the
reference C++ loader and tts_tpu loaders expect.

Install with: sys.modules["gguf"] = tests.gguf_shim (before importing
tts_encoders).
"""
from __future__ import annotations

import numpy as np

from tts_tpu.gguf import quants
from tts_tpu.gguf.writer import GGUFWriter as _TTSWriter

GGML_QUANT_VERSION = 2


class GGMLQuantizationType:
    F32 = quants.GGML_TYPE_F32
    F16 = quants.GGML_TYPE_F16
    Q4_0 = quants.GGML_TYPE_Q4_0
    Q5_0 = quants.GGML_TYPE_Q5_0
    Q8_0 = quants.GGML_TYPE_Q8_0
    I32 = quants.GGML_TYPE_I32


class GGUFType:
    MODEL = "model"


class LlamaFileType:
    ALL_F32 = 0
    MOSTLY_F16 = 1


class GGUFEndian:
    LITTLE = 0


def size_label(total_params, shared_params, expert_params, expert_count):
    n = abs(int(total_params))
    for div, suffix in ((10 ** 9, "B"), (10 ** 6, "M"), (10 ** 3, "K")):
        if n >= div:
            return f"{round(n / div):.0f}{suffix}"
    return str(n)


class Metadata:
    def __init__(self):
        self.name = None
        self.size_label = None

    @staticmethod
    def load(metadata_override=None, model_path=None, name=None,
             total_params=0):
        md = Metadata()
        md.name = str(name) if name is not None else None
        return md

    def set_gguf_meta_model(self, writer: "GGUFWriter"):
        if self.name:
            writer.add_string("general.name", self.name)
        if self.size_label:
            writer.add_string("general.size_label", self.size_label)


class _ReaderField:
    """Mimics gguf-py's ReaderField enough for the kokoro encoder's
    phonemizer transplant: `bytes(field.parts[idx]) for idx in field.data`."""

    def __init__(self, strings):
        self.parts = [s.encode("utf-8") for s in strings]
        self.data = list(range(len(strings)))


class GGUFReader:
    """Read-side subset of gguf-py used by kokoro_gguf_encoder's
    encode_tts_phonemizer, backed by tts_tpu's reader."""

    def __init__(self, path):
        from tts_tpu.gguf.reader import GGUFReader as _R
        self._r = _R(str(path))

    def get_field(self, key):
        v = self._r.metadata.get(key)
        if v is None:
            return None
        return _ReaderField([str(x) for x in v])


class GGUFWriter:
    """API-compatible subset of gguf-py's GGUFWriter used by py-gguf."""

    def __init__(self, path=None, arch=""):
        self.path = path
        self.arch = arch
        self._arch0 = arch
        self._kv = [("general.architecture", arch)]
        self._tensors = []       # (name, np.ndarray)

    # --- tensors ---
    def add_tensor(self, name, tensor, raw_shape=None, raw_dtype=None):
        self._tensors.append((name, np.ascontiguousarray(tensor)))

    def get_total_parameter_count(self):
        total = int(sum(t.size for _, t in self._tensors))
        return total, total, 0, 0

    # --- generic kv ---
    def _kv_add(self, key, value):
        self._kv.append((key, value))

    def add_uint32(self, key, v):
        self._kv_add(key, int(v))

    add_int32 = add_uint32
    add_uint = add_uint32

    def add_float32(self, key, v):
        self._kv_add(key, float(v))

    def add_string(self, key, v):
        self._kv_add(key, str(v))

    def add_bool(self, key, v):
        self._kv_add(key, bool(v))

    def add_array(self, key, values):
        self._kv_add(key, list(values))

    # --- llama.cpp-style named helpers (upstream gguf-py key constants) ---
    def add_type(self, t):
        self.add_string("general.type", t)

    def add_quantization_version(self, v):
        self.add_uint32("general.quantization_version", v)

    def add_file_type(self, v):
        self.add_uint32("general.file_type", v)

    def add_context_length(self, v):
        self.add_uint32(f"{self.arch}.context_length", v)

    def add_embedding_length(self, v):
        self.add_uint32(f"{self.arch}.embedding_length", v)

    def add_block_count(self, v):
        self.add_uint32(f"{self.arch}.block_count", v)

    def add_feed_forward_length(self, v):
        self.add_uint32(f"{self.arch}.feed_forward_length", v)

    def add_head_count(self, v):
        self.add_uint32(f"{self.arch}.attention.head_count", v)

    def add_head_count_kv(self, v):
        self.add_uint32(f"{self.arch}.attention.head_count_kv", v)

    def add_vocab_size(self, v):
        self.add_uint32(f"{self.arch}.vocab_size", v)

    def add_decoder_start_token_id(self, v):
        self.add_uint32(f"{self.arch}.decoder_start_token_id", v)

    def add_token_list(self, tokens):
        self.add_array("tokenizer.ggml.tokens", [str(t) for t in tokens])

    def add_token_scores(self, scores):
        self.add_array("tokenizer.ggml.scores", [float(s) for s in scores])

    def add_token_merges(self, merges):
        self.add_array("tokenizer.ggml.merges", [str(m) for m in merges])

    def add_bos_token_id(self, v):
        self.add_uint32("tokenizer.ggml.bos_token_id", v)

    def add_eos_token_id(self, v):
        self.add_uint32("tokenizer.ggml.eos_token_id", v)

    def add_unk_token_id(self, v):
        self.add_uint32("tokenizer.ggml.unknown_token_id", v)

    def add_pad_token_id(self, v):
        self.add_uint32("tokenizer.ggml.padding_token_id", v)

    def add_add_bos_token(self, v):
        self.add_bool("tokenizer.ggml.add_bos_token", v)

    def add_add_eos_token(self, v):
        self.add_bool("tokenizer.ggml.add_eos_token", v)

    # --- file emission (delegates to tts_tpu's writer) ---
    def write_header_to_file(self, path=None):
        if path is not None:
            self.path = str(path)

    def write_kv_data_to_file(self):
        pass

    def write_tensors_to_file(self, progress=False):
        w = _TTSWriter(str(self.path), self._arch0)
        for key, value in self._kv:
            if key == "general.architecture":
                continue  # written by _TTSWriter.__init__
            if isinstance(value, list):
                w.add_array(key, value)
            else:
                w.add_kv(key, value)
        for name, arr in self._tensors:
            w.add_tensor(name, arr)
        w.write()

    def close(self):
        pass
