from reverb_tpu.decode.results import DecodeResult
