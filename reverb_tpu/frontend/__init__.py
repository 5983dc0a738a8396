from reverb_tpu.frontend.fbank import FbankConfig, compute_fbank, num_frames
from reverb_tpu.frontend.cmvn import load_cmvn, apply_cmvn
