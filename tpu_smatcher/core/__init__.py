from tpu_smatcher.core.alphabet import Alphabet
from tpu_smatcher.core.patterns import PatternSet
from tpu_smatcher.core import datagen
from tpu_smatcher.core import corpus

__all__ = ["Alphabet", "PatternSet", "datagen", "corpus"]
