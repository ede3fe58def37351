from trt_asr_tpu.decode.host_decode import tdt_greedy_decode_host  # noqa: F401
from trt_asr_tpu.decode.tdt_greedy import (  # noqa: F401
    DecodeState,
    init_decode_state,
    prime_decode_state,
    tdt_greedy_decode_chunk,
)
from trt_asr_tpu.decode.timestamps import (  # noqa: F401
    token_intervals,
    word_intervals,
)
from trt_asr_tpu.decode.beam import (  # noqa: F401
    Hypothesis,
    tdt_beam_decode_host,
)
