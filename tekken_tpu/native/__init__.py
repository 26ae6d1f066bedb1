"""Native C++ host engine bindings (ctypes).

The reference delegates its hot loops to a native engine
(tiktoken_rs::CoreBPE — reference: src/tekkenizer.rs:125).  Our equivalent is
a C++ shared library implementing the Tekken pre-tokenizer + BPE merge for the
host side of the pipeline (data loading / CPU fallback); the device side is
the XLA/Pallas path in ops/.

Import raises if the library hasn't been built; build with
``python -m tekken_tpu.native.build``.
"""

from .engine import NativeEncoder  # noqa: F401
