"""Command-line programs mirroring the reference's prog/ binaries.

python -m lut_ldpc_tpu.cli.ber_sim    — Monte-Carlo BER/FER simulation
python -m lut_ldpc_tpu.cli.de_sim     — DE threshold search
python -m lut_ldpc_tpu.cli.alist2ens  — alist -> empirical .ens
python -m lut_ldpc_tpu.cli.ens2deg    — .ens -> PEG .deg
"""
