from reverb_tpu.text.tokenizer import (BaseTokenizer, CharTokenizer,
                                       init_tokenizer)
from reverb_tpu.text.rev_bpe import RevBpeTokenizer
