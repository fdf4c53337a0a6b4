from tris_tpu.tokenizer.bpe import ClipBPETokenizer, tokenize

__all__ = ["ClipBPETokenizer", "tokenize"]
