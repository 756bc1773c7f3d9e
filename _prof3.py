import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(f'[{time.time()-T0:7.1f}s]', *a, flush=True)
T0=time.time()
from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import generate_synthetic_sequences, SequenceDataset
from rails_tpu.train.loop import create_train_state
from rails_tpu.models.hstu import HSTUBlock, RelativeBucketedTimeAndPositionBias

num_items=26744; batch_size=32
cfg = get_experiment_config('ml-20m-hstu-mol')
cfg = cfg.replace(data=cfg.data.replace(dataset_name='synthetic', synthetic_num_users=128, synthetic_num_items=num_items),
                  train=cfg.train.replace(local_batch_size=batch_size, num_negatives=128))
seqs = generate_synthetic_sequences(num_users=128, num_items=num_items, max_len=64, seed=0)
ds = SequenceDataset(seqs, cfg.data.max_sequence_length, ignore_last_n=1)
batch = next(ds.batches(batch_size=batch_size, max_output_length=cfg.train.gr_output_length+1, shuffle=False))
ai = np.arange(1, num_items+1, dtype=np.int32)
model, state, _, _ = create_train_state(cfg, num_items, ai, batch)
params = state.params
feats = batch.features
log('setup')

def timeit(name, fn, *a, n=10):
    r = fn(*a); _ = np.asarray(jax.tree_util.tree_leaves(r)[0])  # force host fetch
    t0=time.perf_counter()
    for _ in range(n):
        r = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0])
    log(name, f'{(time.perf_counter()-t0)/n*1e3:.2f} ms (host-fetch)')

enc = jax.jit(lambda p,f: jnp.sum(model.apply(p,f,method=model.encode)))
timeit('encode(sum)', enc, params, feats)

# encoder without rel bias
cfg2 = cfg.replace(hstu=cfg.hstu.replace(enable_relative_attention_bias=False))
model2, state2, _, _ = create_train_state(cfg2, num_items, ai, batch)
enc2 = jax.jit(lambda p,f: jnp.sum(model2.apply(p,f,method=model2.encode)))
timeit('encode-no-relbias', enc2, state2.params, feats)

# rel bias module alone, 16x
bias_mod = RelativeBucketedTimeAndPositionBias(max_seq_len=211, num_buckets=128)
bp = bias_mod.init(jax.random.PRNGKey(0), feats.timestamps)
bias_fn = jax.jit(lambda p, ts: jnp.sum(sum(bias_mod.apply(p, ts) for _ in range(16))))
timeit('relbias x16', bias_fn, bp, feats.timestamps)
