from reverb_tpu.data.dataset import Dataset
