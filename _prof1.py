import time, sys, numpy as np, jax, jax.numpy as jnp
def log(*a): print(f'[{time.time()-T0:7.1f}s]', *a, flush=True)
T0=time.time()
from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import generate_synthetic_sequences, SequenceDataset
from rails_tpu.train.evaluation import get_eval_state, make_eval_step, ranks_from_top_k
from rails_tpu.index.candidate_index import select_top_k_with_invalid_filter
from rails_tpu.index.top_k import TopKResult
from rails_tpu.train.loop import create_train_state

num_items=26744; batch_size=32
cfg = get_experiment_config('ml-20m-hstu-mol')
cfg = cfg.replace(data=cfg.data.replace(dataset_name='synthetic', synthetic_num_users=128, synthetic_num_items=num_items),
                  train=cfg.train.replace(local_batch_size=batch_size, num_negatives=128))
seqs = generate_synthetic_sequences(num_users=128, num_items=num_items, max_len=64, seed=0)
ds = SequenceDataset(seqs, cfg.data.max_sequence_length, ignore_last_n=1)
batch = next(ds.batches(batch_size=batch_size, max_output_length=cfg.train.gr_output_length+1, shuffle=False))
ai = np.arange(1, num_items+1, dtype=np.int32)
log('data ready')
model, state, _, _ = create_train_state(cfg, num_items, ai, batch)
params = state.params
log('model ready')
es = get_eval_state(model, params, ai, 'MoLBruteForceTopK')
log('eval state ready')

def timeit(name, fn, *a, n=20):
    r = fn(*a); jax.block_until_ready(r)
    log(name, 'compiled')
    t0=time.perf_counter()
    for _ in range(n): r = fn(*a)
    jax.block_until_ready(r)
    log(name, (time.perf_counter()-t0)/n*1e3, 'ms')
    return r

feats, targets = batch.features, batch.target_ids
q = jax.jit(lambda p,f: model.apply(p,f,method=model.encode))(params, feats)
q.block_until_ready(); log('q ready')

res = timeit('topk200', lambda: es.top_k_fn(q, 200, user_ids=feats.user_ids))
fil = jax.jit(lambda s, i, inv, t: ranks_from_top_k(select_top_k_with_invalid_filter(TopKResult(s,i), inv, 120).ids, t))
timeit('filter+rank', fil, res.scores, res.ids, feats.ids, targets)

step = make_eval_step(model, es, k=120, filter_invalid_ids=True, truncate_k_prime_to=200)
timeit('full step', lambda: step(params, feats, targets))
