from unify_spark.audio.pcm import (  # noqa: F401
    CODEC_DOMAIN,
    decode,
    encode,
    snr_db,
    synth_pcm16,
)
