# TPU: fused kernel vs XLA brute force, exactness + speed at ML-20M scale.
import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(f'[{time.time()-T0:7.1f}s]', *a, flush=True)
T0=time.time()
from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import generate_synthetic_sequences, SequenceDataset
from rails_tpu.train.evaluation import get_eval_state, make_eval_step
from rails_tpu.train.loop import create_train_state

num_items=26744; batch_size=32
cfg = get_experiment_config('ml-20m-hstu-mol')
cfg = cfg.replace(data=cfg.data.replace(dataset_name='synthetic', synthetic_num_users=128, synthetic_num_items=num_items),
                  train=cfg.train.replace(local_batch_size=batch_size, num_negatives=128, main_module_bf16=True, eval_bf16=True))
seqs = generate_synthetic_sequences(num_users=128, num_items=num_items, max_len=64, seed=0)
ds = SequenceDataset(seqs, cfg.data.max_sequence_length, ignore_last_n=1)
batch = next(ds.batches(batch_size=batch_size, max_output_length=cfg.train.gr_output_length+1, shuffle=False))
ai = np.arange(1, num_items+1, dtype=np.int32)
model, state, _, _ = create_train_state(cfg, num_items, ai, batch)
params = state.params
log('model ready')
es = get_eval_state(model, params, ai, 'MoLBruteForceTopK')
es_f = get_eval_state(model, params, ai, 'MoLBruteForceTopKFused')
log('states ready')
feats = batch.features
q = jax.jit(lambda p,f: model.apply(p,f,method=model.encode))(params, feats)
q.block_until_ready()

def timeit(name, fn, n=30):
    r = fn(); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = fn()
    jax.block_until_ready(r)
    log(name, f'{(time.perf_counter()-t0)/n*1e3:.3f} ms')
    return r

ref = timeit('xla topk200', lambda: es.top_k_fn(q, 200, user_ids=feats.user_ids))
fus = timeit('fused topk200', lambda: es_f.top_k_fn(q, 200, user_ids=feats.user_ids))
ids_r, ids_f = np.asarray(ref.ids), np.asarray(fus.ids)
agree = (ids_r == ids_f).mean()
log('top200 id agreement:', agree)
top1 = (ids_r[:,0]==ids_f[:,0]).mean(); log('top1 agreement:', top1)

# full serving step with fused
step = make_eval_step(model, es_f, k=120, filter_invalid_ids=True, truncate_k_prime_to=200)
r = timeit('full fused step', lambda: step(params, feats, batch.target_ids))
step2 = make_eval_step(model, es, k=120, filter_invalid_ids=True, truncate_k_prime_to=200)
r2 = timeit('full xla step', lambda: step2(params, feats, batch.target_ids))
