from unify_spark.audio.pcm import (  # noqa: F401
    CODEC_DOMAIN,
    DECODABLE_CODECS,
    decode,
    encode,
    snr_db,
    synth_pcm16,
)
