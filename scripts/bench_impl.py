import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys, time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from cswin_unet_tpu.models import CSWinUNet, CSwinUnet
from cswin_unet_tpu.utils.checkpoint import load_checkpoint
impl = sys.argv[1]
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128
model = CSwinUnet(backbone=CSWinUNet(img_size=224, num_classes=9, embed_dim=64,
    depth=(1,2,9,1), split_size=(1,2,7,7), num_heads=(2,4,8,16), dtype=jnp.bfloat16, attn_impl=impl))
params, _ = load_checkpoint('/tmp/tiny224_params.npz')
chain_a, chain_b = 21, 41
def chained(p, x, K):
    def body(c, _):
        pred = model.apply(p, c)
        return c + 1e-6*pred[...,:1], ()
    c, _ = lax.scan(body, x, None, length=K)
    return jnp.sum(c)
f1 = jax.jit(lambda p,x: chained(p,x,chain_a)); fk = jax.jit(lambda p,x: chained(p,x,chain_b))
x = jnp.asarray(np.random.default_rng(0).normal(size=(B,224,224,1)).astype(np.float32))
t0=time.perf_counter(); float(f1(params,x)); print('compile f1', time.perf_counter()-t0)
t0=time.perf_counter(); float(fk(params,x)); print('compile fk', time.perf_counter()-t0)
def best(f,n=3):
    ts=[]
    for _ in range(n):
        t0=time.perf_counter(); float(f(params,x)); ts.append(time.perf_counter()-t0)
    return min(ts)
per = (best(fk)-best(f1))/(chain_b-chain_a)
print(f"{impl} B={B}: {per*1000:.2f} ms/fwd, {B/per:.0f} slices/s")
