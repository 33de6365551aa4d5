"""Grad-TTS configuration (flat module, same surface as the reference
Grad-TTS/params.py so recipes port over unchanged)."""

import os

from tpu_speech.ops.masks import fix_len_compatibility

# data parameters
train_filelist_path = "resources/filelists/ljspeech/train.txt"
valid_filelist_path = "resources/filelists/ljspeech/valid.txt"
test_filelist_path = "resources/filelists/ljspeech/test.txt"
_REF_CMUDICT = "/root/reference/Grad-TTS/resources/cmu_dictionary"
cmudict_path = (
    _REF_CMUDICT if os.path.exists(_REF_CMUDICT) else "resources/cmu_dictionary"
)
add_blank = True
n_spks = 1  # 247 for Libri-TTS filelist and 1 for LJSpeech
spk_emb_dim = 64
n_feats = 80
n_fft = 1024
sample_rate = 22050
hop_length = 256
win_length = 1024
f_min = 0
f_max = 8000

# encoder parameters
n_enc_channels = 192
filter_channels = 768
filter_channels_dp = 256
n_enc_layers = 6
enc_kernel = 3
enc_dropout = 0.1
n_heads = 2
window_size = 4

# decoder parameters
dec_dim = 64
beta_min = 0.05
beta_max = 20.0
pe_scale = 1000  # 1 for old checkpoints

# training parameters
log_dir = "logs/new_exp"
test_size = 4
n_epochs = 10000
batch_size = 16
learning_rate = 1e-4
seed = 37
save_every = 1
precision = "fp32"  # 'bf16' runs the network fwd/bwd in bfloat16 (MXU-native)
out_size = fix_len_compatibility(2 * 22050 // 256)

# inference parameters
y_max_length_bucket = 256  # static mel-length bucket granularity for jit
