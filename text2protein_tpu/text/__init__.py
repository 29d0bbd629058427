from .encoder import (
    TextEncoder,
    HashTextEncoder,
    CachedTextEncoder,
    HFEmbeddingEncoder,
    build_text_encoder,
    encode_captions,
)
