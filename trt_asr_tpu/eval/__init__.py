from trt_asr_tpu.eval.wer import normalize_text, score_pair, score_corpus  # noqa: F401
