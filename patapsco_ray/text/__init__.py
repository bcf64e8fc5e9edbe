from .normalize import Normalizer, create_normalizer
from .processor import MAX_TEXT_LEN, TextConfig, TextProcessor
from .stem import CachedStemmer, PorterStemmer, create_stemmer
from .stopwords import StopWordsRemover, load_stopwords
from .tokenize import NgramTokenizer, WhiteSpaceTokenizer, create_tokenizer

__all__ = [
    "Normalizer", "create_normalizer", "MAX_TEXT_LEN", "TextConfig",
    "TextProcessor", "CachedStemmer", "PorterStemmer", "create_stemmer",
    "StopWordsRemover", "load_stopwords", "NgramTokenizer",
    "WhiteSpaceTokenizer", "create_tokenizer",
]
