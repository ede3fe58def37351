"""trt_asr_tpu — a TPU-native streaming ASR framework (Parakeet-TDT family).

A from-scratch rebuild of the capabilities of ``gracee3/trt-asr-engine``
(offline Rust/TensorRT/C++ streaming ASR prototype) on JAX/XLA/Pallas/pjit:

- ``frontend``   — log-mel feature extraction (MXU DFT-matmul + Pallas fusion)
- ``models``     — Fast Conformer encoder, LSTM predictor, TDT joint
- ``ops``        — attention / conv / lstm primitives + Pallas kernels
- ``decode``     — on-device TDT greedy decode (lax.while_loop)
- ``streaming``  — cache-aware streaming state machine + sessions
- ``parallel``   — mesh/sharding (DP over streams, optional TP)
- ``runtime``    — event queue, C-ABI bridge, instrumentation
- ``io``         — WAV/PCM, golden-fixture JSONL, dependency-free ONNX reader

Reference parity: contracts/parakeet-tdt-0.6b-v3.json (derived from the
reference's machine-checkable model contract).
"""

__version__ = "0.1.0"

from trt_asr_tpu.contract import Contract, load_contract  # noqa: F401
