import json, logging, sys, time, numpy as np, jax
logging.basicConfig(stream=sys.stdout, level=logging.INFO)
def log(*a): print(f'[{time.time()-T0:7.1f}s]', *a, flush=True)
T0=time.time()
from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.train.driver import run_training
from rails_tpu.train import evaluation as ev

cfg = get_experiment_config('ml-1m-hstu-mol')
cfg = cfg.replace(
    data=cfg.data.replace(dataset_name='synthetic', max_sequence_length=64,
                          synthetic_num_users=16384, synthetic_num_items=20000),
    mol=cfg.mol.replace(uid_embedding_hash_sizes=(16384,)),
    train=cfg.train.replace(local_batch_size=128, eval_batch_size=128,
                            num_negatives=128, num_epochs=60,
                            eval_interval=5000, partial_eval_num_iters=4,
                            full_eval_every_n=20),
)
ds = get_reco_dataset(cfg.data)
res = run_training(cfg, workdir='/tmp/long_run2', use_mesh=False, dataset=ds)
model, params = res.model, res.state.params
batches = list(__import__('itertools').islice(ds.eval_dataset.batches(batch_size=128, max_output_length=cfg.train.gr_output_length+1, shuffle=False, drop_last=True), 16))
es = ev.get_eval_state(model, params, ds.all_item_ids, 'MoLBruteForceTopK')
m, _ = ev.eval_metrics_from_batches(model, params, es, batches, k=200)
s = ev.summarize_metrics(m)
log('FULL exact eval @60ep/20k items:', {k: round(s[k],4) for k in ('hr@10','hr@50','hr@200','ndcg@10','ndcg@200','mrr')})
