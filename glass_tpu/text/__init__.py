from .codec import TextCodec, decode_topk_probs, GO_TOKEN, STOP_TOKEN, UNK_TOKEN
