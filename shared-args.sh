# Shared hyperparameters for the launch scripts (reference shared-args.sh:3-15).
batch_size=10
generator_lr=0.0002
discriminator_lr=0.0002
dataset=CIFAR10
epochs=30000
local_epochs=1
iid=1
log_interval=300
seed=1
beta_1=0.0      # effective reference value: run scripts never forwarded beta_1,
beta_2=0.999    # so argparse defaults (0.0, 0.999) applied (bootstrap.py:49-50)
chunk_size=100
compute_dtype=bfloat16
