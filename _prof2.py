import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(f'[{time.time()-T0:7.1f}s]', *a, flush=True)
T0=time.time()
from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import generate_synthetic_sequences, SequenceDataset
from rails_tpu.train.evaluation import get_eval_state, ranks_from_top_k
from rails_tpu.index.candidate_index import select_top_k_with_invalid_filter, k_prime_for
from rails_tpu.index.top_k import TopKResult, mol_brute_force_top_k
from rails_tpu.train.loop import create_train_state

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
es = get_eval_state(model, params, ai, 'MoLBruteForceTopK')
log('setup done')

feats, targets = batch.features, batch.target_ids
st = es.topk_state

def timeit(name, fn, *a, n=20):
    r = fn(*a); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = fn(*a)
    jax.block_until_ready(r)
    log(name, f'{(time.perf_counter()-t0)/n*1e3:.2f} ms')

# A: encode+topk fused
@jax.jit
def enc_topk(params, feats):
    q = model.apply(params, feats, method=model.encode)
    return mol_brute_force_top_k(model, params, st, q, 200, user_ids=feats.user_ids)
timeit('A encode+topk', enc_topk, params, feats)

# B: topk+filter+rank fused (q precomputed)
q = jax.jit(lambda p,f: model.apply(p,f,method=model.encode))(params, feats)
@jax.jit
def topk_filter(params, q, ids, targets, user_ids):
    res = mol_brute_force_top_k(model, params, st, q, 200, user_ids=user_ids)
    res = select_top_k_with_invalid_filter(res, ids, 120)
    return ranks_from_top_k(res.ids, targets)
timeit('B topk+filter+rank', topk_filter, params, q, feats.ids, targets, feats.user_ids)

# C: full fused
@jax.jit
def full(params, feats, targets):
    q = model.apply(params, feats, method=model.encode)
    res = mol_brute_force_top_k(model, params, st, q, 200, user_ids=feats.user_ids)
    res = select_top_k_with_invalid_filter(res, feats.ids, 120)
    return ranks_from_top_k(res.ids, targets)
timeit('C full', full, params, feats, targets)
