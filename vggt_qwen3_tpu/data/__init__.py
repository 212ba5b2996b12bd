from .tokenizer import ByteTokenizer, load_tokenizer
