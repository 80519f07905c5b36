from dig_tpu.metrics.text import (
    accuracy,
    ctc_accuracy,
    decode_batch,
    edit_distance,
    factory,
    levenshtein,
    recognition_f_measure,
)
