// hekaton_native: BN254 host algebra (Fq tower, G1/G2, Pippenger MSM, optimal-ate
// pairing) with a C ABI for ctypes.
//
// Plays the role of arkworks' assembly field arithmetic in the reference
// (/root/reference/distributed-prover/Cargo.toml:79 `asm` feature): the
// latency-bound host-side algebra (pairings, IPP commitments, TIPA folding,
// verifier checks) that does not belong on the TPU. The TPU kernels
// (JAX/Pallas MSM/NTT) handle the throughput-bound prover work; this library
// keeps the coordinator/aggregator off the Python interpreter's bigint path.
//
// Conventions (all little-endian byte buffers):
//   Fq/Fr element : 32 bytes
//   G1 point      : 64 bytes (x|y), infinity = all zeros
//   G2 point      : 128 bytes (x.c0|x.c1|y.c0|y.c1), infinity = all zeros
//   Fq12 element  : 384 bytes, coefficient order matching
//                   hekaton_tpu.fields.host.Fq12.to_coeffs()
#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

struct U256 { u64 v[4]; };

static inline U256 u256_zero() { U256 r; r.v[0]=r.v[1]=r.v[2]=r.v[3]=0; return r; }

static inline bool u256_is_zero(const U256&a){ return !(a.v[0]|a.v[1]|a.v[2]|a.v[3]); }
static inline bool u256_eq(const U256&a,const U256&b){
    return a.v[0]==b.v[0]&&a.v[1]==b.v[1]&&a.v[2]==b.v[2]&&a.v[3]==b.v[3];
}
static inline int u256_cmp(const U256&a,const U256&b){
    for(int i=3;i>=0;--i){ if(a.v[i]<b.v[i])return -1; if(a.v[i]>b.v[i])return 1; }
    return 0;
}
// returns carry
static inline u64 u256_add(U256&r,const U256&a,const U256&b){
    u128 c=0;
    for(int i=0;i<4;++i){ c += (u128)a.v[i] + b.v[i]; r.v[i]=(u64)c; c >>= 64; }
    return (u64)c;
}
// returns borrow
static inline u64 u256_sub(U256&r,const U256&a,const U256&b){
    u128 br=0;
    for(int i=0;i<4;++i){
        u128 t = (u128)a.v[i] - b.v[i] - br;
        r.v[i]=(u64)t; br = (t >> 64) ? 1 : 0;
    }
    return (u64)br;
}

static inline void u256_from_bytes(U256&r,const uint8_t*b){
    for(int i=0;i<4;++i){
        u64 w=0; for(int j=0;j<8;++j) w |= (u64)b[i*8+j] << (8*j);
        r.v[i]=w;
    }
}
static inline void u256_to_bytes(const U256&a,uint8_t*b){
    for(int i=0;i<4;++i) for(int j=0;j<8;++j) b[i*8+j]=(uint8_t)(a.v[i]>>(8*j));
}

// ---------------------------------------------------------------------------
// Montgomery context (generic odd 256-bit modulus)
// ---------------------------------------------------------------------------
struct FpCtx {
    U256 p;
    u64 ninv;      // -p^{-1} mod 2^64
    U256 r_mod;    // 2^256 mod p  (= one in Montgomery form)
    U256 r2;       // (2^256)^2 mod p
};

static void fp_ctx_init(FpCtx&c,const U256&p){
    c.p=p;
    u64 x=1;
    for(int i=0;i<6;++i) x *= 2 - p.v[0]*x;   // Newton: x = p^{-1} mod 2^64
    c.ninv = (u64)(0 - x);
    // r_mod = 2^256 mod p by 256 conditional-subtract doublings of 1
    U256 r; r=u256_zero(); r.v[0]=1;
    for(int i=0;i<256;++i){
        U256 t; u64 carry=u256_add(t,r,r);
        if(carry || u256_cmp(t,p)>=0){ U256 s; u256_sub(s,t,p); t=s; }
        r=t;
    }
    c.r_mod=r;
    // r2 = 2^512 mod p: double r_mod 256 times
    U256 q=r;
    for(int i=0;i<256;++i){
        U256 t; u64 carry=u256_add(t,q,q);
        if(carry || u256_cmp(t,p)>=0){ U256 s; u256_sub(s,t,p); t=s; }
        q=t;
    }
    c.r2=q;
}

// CIOS Montgomery multiplication: r = a*b*2^{-256} mod p
static inline void mont_mul(const FpCtx&c,U256&r,const U256&a,const U256&b){
    u64 t[5]={0,0,0,0,0};
    for(int i=0;i<4;++i){
        u128 carry=0;
        for(int j=0;j<4;++j){
            u128 cur = (u128)t[j] + (u128)a.v[i]*b.v[j] + carry;
            t[j]=(u64)cur; carry = cur>>64;
        }
        u128 cur4 = (u128)t[4] + carry;
        t[4]=(u64)cur4;
        u64 over = (u64)(cur4>>64);
        u64 m = t[0]*c.ninv;
        carry = ((u128)t[0] + (u128)m*c.p.v[0]) >> 64;
        for(int j=1;j<4;++j){
            u128 cur = (u128)t[j] + (u128)m*c.p.v[j] + carry;
            t[j-1]=(u64)cur; carry = cur>>64;
        }
        u128 cur4b = (u128)t[4] + carry;
        t[3]=(u64)cur4b;
        t[4]=over + (u64)(cur4b>>64);
    }
    U256 res; res.v[0]=t[0];res.v[1]=t[1];res.v[2]=t[2];res.v[3]=t[3];
    if(t[4] || u256_cmp(res,c.p)>=0){ U256 s; u256_sub(s,res,c.p); res=s; }
    r=res;
}

static inline void fp_add(const FpCtx&c,U256&r,const U256&a,const U256&b){
    U256 t; u64 carry=u256_add(t,a,b);
    if(carry || u256_cmp(t,c.p)>=0){ U256 s; u256_sub(s,t,c.p); t=s; }
    r=t;
}
static inline void fp_sub(const FpCtx&c,U256&r,const U256&a,const U256&b){
    U256 t; u64 br=u256_sub(t,a,b);
    if(br){ U256 s; u256_add(s,t,c.p); t=s; }
    r=t;
}
static inline void fp_neg(const FpCtx&c,U256&r,const U256&a){
    if(u256_is_zero(a)){ r=a; return; }
    u256_sub(r,c.p,a);
}
// r = a^e mod p (a in Montgomery form, e plain U256)
static void fp_pow(const FpCtx&c,U256&r,const U256&a,const U256&e){
    U256 acc=c.r_mod, base=a;
    for(int i=0;i<256;++i){
        if((e.v[i/64]>>(i%64))&1) mont_mul(c,acc,acc,base);
        mont_mul(c,base,base,base);
    }
    r=acc;
}
static void fp_inv(const FpCtx&c,U256&r,const U256&a){
    U256 e; u256_sub(e,c.p,(U256){{2,0,0,0}});
    fp_pow(c,r,a,e);
}

// Global contexts
static FpCtx FQ;   // base field
static FpCtx FR;   // scalar field (only used for plain mod-R arithmetic)
static bool INITED=false;

// BN254 constants
static const u64 P_LIMBS[4] = {0x3c208c16d87cfd47ull,0x97816a916871ca8dull,
                               0xb85045b68181585dull,0x30644e72e131a029ull};
static const u64 R_LIMBS[4] = {0x43e1f593f0000001ull,0x2833e84879b97091ull,
                               0xb85045b68181585dull,0x30644e72e131a029ull};
// ate loop count 6x+2 = 29793968203157093288 = 2^64 + 11347224129447541672
// (65 bits — must be u128)
static const u128 ATE_LOOP = ((u128)1 << 64) | 11347224129447541672ull;

// ---------------------------------------------------------------------------
// Fq wrapper (Montgomery form)
// ---------------------------------------------------------------------------
struct Fq { U256 m; };
static inline Fq fq_zero(){ Fq r; r.m=u256_zero(); return r; }
static inline Fq fq_one(){ Fq r; r.m=FQ.r_mod; return r; }
static inline bool fq_is_zero(const Fq&a){ return u256_is_zero(a.m); }
static inline bool fq_eq(const Fq&a,const Fq&b){ return u256_eq(a.m,b.m); }
static inline Fq fq_add(const Fq&a,const Fq&b){ Fq r; fp_add(FQ,r.m,a.m,b.m); return r; }
static inline Fq fq_sub(const Fq&a,const Fq&b){ Fq r; fp_sub(FQ,r.m,a.m,b.m); return r; }
static inline Fq fq_neg(const Fq&a){ Fq r; fp_neg(FQ,r.m,a.m); return r; }
static inline Fq fq_mul(const Fq&a,const Fq&b){ Fq r; mont_mul(FQ,r.m,a.m,b.m); return r; }
static inline Fq fq_inv(const Fq&a){ Fq r; fp_inv(FQ,r.m,a.m); return r; }
static inline Fq fq_from_u64(u64 x){
    U256 t=u256_zero(); t.v[0]=x; Fq r; mont_mul(FQ,r.m,t,FQ.r2); return r;
}
static inline Fq fq_from_bytes(const uint8_t*b){
    U256 t; u256_from_bytes(t,b); Fq r; mont_mul(FQ,r.m,t,FQ.r2); return r;
}
static inline void fq_to_bytes(const Fq&a,uint8_t*b){
    U256 one=u256_zero(); one.v[0]=1; U256 t; mont_mul(FQ,t,a.m,one);
    u256_to_bytes(t,b);
}

// ---------------------------------------------------------------------------
// Fq2 = Fq[u]/(u^2+1)
// ---------------------------------------------------------------------------
struct Fq2 { Fq c0,c1; };
static inline Fq2 fq2_zero(){ return {fq_zero(),fq_zero()}; }
static inline Fq2 fq2_one(){ return {fq_one(),fq_zero()}; }
static inline bool fq2_is_zero(const Fq2&a){ return fq_is_zero(a.c0)&&fq_is_zero(a.c1); }
static inline bool fq2_eq(const Fq2&a,const Fq2&b){ return fq_eq(a.c0,b.c0)&&fq_eq(a.c1,b.c1); }
static inline Fq2 fq2_add(const Fq2&a,const Fq2&b){ return {fq_add(a.c0,b.c0),fq_add(a.c1,b.c1)}; }
static inline Fq2 fq2_sub(const Fq2&a,const Fq2&b){ return {fq_sub(a.c0,b.c0),fq_sub(a.c1,b.c1)}; }
static inline Fq2 fq2_neg(const Fq2&a){ return {fq_neg(a.c0),fq_neg(a.c1)}; }
static inline Fq2 fq2_mul(const Fq2&a,const Fq2&b){
    Fq t0=fq_mul(a.c0,b.c0), t1=fq_mul(a.c1,b.c1);
    Fq s=fq_mul(fq_add(a.c0,a.c1),fq_add(b.c0,b.c1));
    return {fq_sub(t0,t1), fq_sub(fq_sub(s,t0),t1)};
}
static inline Fq2 fq2_sq(const Fq2&a){ return fq2_mul(a,a); }
static inline Fq2 fq2_conj(const Fq2&a){ return {a.c0,fq_neg(a.c1)}; }
static inline Fq2 fq2_inv(const Fq2&a){
    Fq d=fq_add(fq_mul(a.c0,a.c0),fq_mul(a.c1,a.c1));
    Fq di=fq_inv(d);
    return {fq_mul(a.c0,di), fq_neg(fq_mul(a.c1,di))};
}
static inline Fq2 fq2_mul_fq(const Fq2&a,const Fq&k){ return {fq_mul(a.c0,k),fq_mul(a.c1,k)}; }
// xi = 9 + u
static inline Fq2 fq2_mul_xi(const Fq2&a){
    Fq nine=fq_from_u64(9);
    return {fq_sub(fq_mul(a.c0,nine),a.c1), fq_add(fq_mul(a.c1,nine),a.c0)};
}
static Fq2 fq2_pow(const Fq2&a,const U256&e){
    Fq2 acc=fq2_one(), base=a;
    for(int i=0;i<256;++i){
        if((e.v[i/64]>>(i%64))&1) acc=fq2_mul(acc,base);
        base=fq2_sq(base);
    }
    return acc;
}

// ---------------------------------------------------------------------------
// Fq6 = Fq2[v]/(v^3 - xi), Fq12 = Fq6[w]/(w^2 - v)
// ---------------------------------------------------------------------------
struct Fq6 { Fq2 c0,c1,c2; };
static inline Fq6 fq6_zero(){ return {fq2_zero(),fq2_zero(),fq2_zero()}; }
static inline Fq6 fq6_one(){ return {fq2_one(),fq2_zero(),fq2_zero()}; }
static inline bool fq6_is_zero(const Fq6&a){ return fq2_is_zero(a.c0)&&fq2_is_zero(a.c1)&&fq2_is_zero(a.c2); }
static inline bool fq6_eq(const Fq6&a,const Fq6&b){ return fq2_eq(a.c0,b.c0)&&fq2_eq(a.c1,b.c1)&&fq2_eq(a.c2,b.c2); }
static inline Fq6 fq6_add(const Fq6&a,const Fq6&b){ return {fq2_add(a.c0,b.c0),fq2_add(a.c1,b.c1),fq2_add(a.c2,b.c2)}; }
static inline Fq6 fq6_sub(const Fq6&a,const Fq6&b){ return {fq2_sub(a.c0,b.c0),fq2_sub(a.c1,b.c1),fq2_sub(a.c2,b.c2)}; }
static inline Fq6 fq6_neg(const Fq6&a){ return {fq2_neg(a.c0),fq2_neg(a.c1),fq2_neg(a.c2)}; }
static inline Fq6 fq6_mul(const Fq6&a,const Fq6&b){
    Fq2 t0=fq2_mul(a.c0,b.c0), t1=fq2_mul(a.c1,b.c1), t2=fq2_mul(a.c2,b.c2);
    Fq2 c0=fq2_add(t0, fq2_mul_xi(fq2_sub(fq2_sub(fq2_mul(fq2_add(a.c1,a.c2),fq2_add(b.c1,b.c2)),t1),t2)));
    Fq2 c1=fq2_add(fq2_sub(fq2_sub(fq2_mul(fq2_add(a.c0,a.c1),fq2_add(b.c0,b.c1)),t0),t1), fq2_mul_xi(t2));
    Fq2 c2=fq2_add(fq2_sub(fq2_sub(fq2_mul(fq2_add(a.c0,a.c2),fq2_add(b.c0,b.c2)),t0),t2), t1);
    return {c0,c1,c2};
}
static inline Fq6 fq6_mul_fq2(const Fq6&a,const Fq2&k){ return {fq2_mul(a.c0,k),fq2_mul(a.c1,k),fq2_mul(a.c2,k)}; }
static inline Fq6 fq6_mul_v(const Fq6&a){ return {fq2_mul_xi(a.c2),a.c0,a.c1}; }
static inline Fq6 fq6_sq(const Fq6&a){ return fq6_mul(a,a); }
static Fq6 fq6_inv(const Fq6&a){
    // standard tower inversion
    Fq2 c0 = fq2_sub(fq2_sq(a.c0), fq2_mul_xi(fq2_mul(a.c1,a.c2)));
    Fq2 c1 = fq2_sub(fq2_mul_xi(fq2_sq(a.c2)), fq2_mul(a.c0,a.c1));
    Fq2 c2 = fq2_sub(fq2_sq(a.c1), fq2_mul(a.c0,a.c2));
    Fq2 t = fq2_add(fq2_mul_xi(fq2_add(fq2_mul(a.c2,c1), fq2_mul(a.c1,c2))), fq2_mul(a.c0,c0));
    Fq2 ti = fq2_inv(t);
    return {fq2_mul(c0,ti), fq2_mul(c1,ti), fq2_mul(c2,ti)};
}

struct Fq12 { Fq6 c0,c1; };
static inline Fq12 fq12_one(){ return {fq6_one(),fq6_zero()}; }
static inline bool fq12_eq(const Fq12&a,const Fq12&b){ return fq6_eq(a.c0,b.c0)&&fq6_eq(a.c1,b.c1); }
static inline Fq12 fq12_add(const Fq12&a,const Fq12&b){ return {fq6_add(a.c0,b.c0),fq6_add(a.c1,b.c1)}; }
static inline Fq12 fq12_sub(const Fq12&a,const Fq12&b){ return {fq6_sub(a.c0,b.c0),fq6_sub(a.c1,b.c1)}; }
static inline Fq12 fq12_neg(const Fq12&a){ return {fq6_neg(a.c0),fq6_neg(a.c1)}; }
static inline Fq12 fq12_mul(const Fq12&a,const Fq12&b){
    Fq6 t0=fq6_mul(a.c0,b.c0), t1=fq6_mul(a.c1,b.c1);
    Fq6 c0=fq6_add(t0, fq6_mul_v(t1));
    Fq6 c1=fq6_sub(fq6_sub(fq6_mul(fq6_add(a.c0,a.c1),fq6_add(b.c0,b.c1)),t0),t1);
    return {c0,c1};
}
static inline Fq12 fq12_sq(const Fq12&a){ return fq12_mul(a,a); }
static inline Fq12 fq12_conj(const Fq12&a){ return {a.c0,fq6_neg(a.c1)}; }
static Fq12 fq12_inv(const Fq12&a){
    Fq6 t = fq6_sub(fq6_sq(a.c0), fq6_mul_v(fq6_sq(a.c1)));
    Fq6 ti = fq6_inv(t);
    return {fq6_mul(a.c0,ti), fq6_neg(fq6_mul(a.c1,ti))};
}
static inline bool fq12_is_zero(const Fq12&a){ return fq6_is_zero(a.c0)&&fq6_is_zero(a.c1); }

// Frobenius constants: v^p = FROB_V * v, w^p = FROB_W * w (as in fields/host.py:115-119)
static Fq2 FROB_V, FROB_W;

static Fq2 fq2_frob_pow(const Fq2&x,int i){ // FROB_V^i etc helper uses repeated mul
    Fq2 acc=fq2_one();
    for(int k=0;k<i;++k) acc=fq2_mul(acc,x);
    return acc;
}
static Fq12 fq12_frobenius(const Fq12&a){
    Fq12 r;
    const Fq6* in[2]={&a.c0,&a.c1};
    Fq6* out[2]={&r.c0,&r.c1};
    for(int half=0;half<2;++half){
        Fq2 ws = (half==0)?fq2_one():FROB_W;
        const Fq2* cs[3]={&in[half]->c0,&in[half]->c1,&in[half]->c2};
        Fq2* os[3]={&out[half]->c0,&out[half]->c1,&out[half]->c2};
        for(int i=0;i<3;++i){
            Fq2 k=fq2_mul(fq2_frob_pow(FROB_V,i),ws);
            *os[i]=fq2_mul(fq2_conj(*cs[i]),k);
        }
    }
    return r;
}

// Fq12 pow by arbitrary-length little-endian u64 exponent
static Fq12 fq12_pow(const Fq12&a,const u64*e,int nwords){
    int top=nwords-1;
    while(top>=0 && e[top]==0) --top;
    if(top<0) return fq12_one();
    Fq12 acc=fq12_one(), base=a;
    for(int w=0;w<=top;++w){
        u64 word=e[w];
        int bits = (w==top)? (64-__builtin_clzll(word)) : 64;
        for(int i=0;i<bits;++i){
            if((word>>i)&1) acc=fq12_mul(acc,base);
            base=fq12_sq(base);
        }
    }
    return acc;
}

// ---------------------------------------------------------------------------
// Curve points (Jacobian), templated over field
// ---------------------------------------------------------------------------
template<class F> struct FOps;
template<> struct FOps<Fq> {
    static Fq zero(){return fq_zero();} static Fq one(){return fq_one();}
    static bool is_zero(const Fq&a){return fq_is_zero(a);}
    static bool eq(const Fq&a,const Fq&b){return fq_eq(a,b);}
    static Fq add(const Fq&a,const Fq&b){return fq_add(a,b);}
    static Fq sub(const Fq&a,const Fq&b){return fq_sub(a,b);}
    static Fq neg(const Fq&a){return fq_neg(a);}
    static Fq mul(const Fq&a,const Fq&b){return fq_mul(a,b);}
    static Fq inv(const Fq&a){return fq_inv(a);}
};
template<> struct FOps<Fq2> {
    static Fq2 zero(){return fq2_zero();} static Fq2 one(){return fq2_one();}
    static bool is_zero(const Fq2&a){return fq2_is_zero(a);}
    static bool eq(const Fq2&a,const Fq2&b){return fq2_eq(a,b);}
    static Fq2 add(const Fq2&a,const Fq2&b){return fq2_add(a,b);}
    static Fq2 sub(const Fq2&a,const Fq2&b){return fq2_sub(a,b);}
    static Fq2 neg(const Fq2&a){return fq2_neg(a);}
    static Fq2 mul(const Fq2&a,const Fq2&b){return fq2_mul(a,b);}
    static Fq2 inv(const Fq2&a){return fq2_inv(a);}
};

template<class F> struct Pt { F x,y,z; bool inf; };

template<class F> static Pt<F> pt_identity(){ Pt<F> p; p.x=FOps<F>::zero();p.y=FOps<F>::one();p.z=FOps<F>::zero(); p.inf=true; return p; }

template<class F> static Pt<F> pt_dbl(const Pt<F>&p){
    using O=FOps<F>;
    if(p.inf || O::is_zero(p.y)) return pt_identity<F>();
    F xx=O::mul(p.x,p.x);
    F yy=O::mul(p.y,p.y);
    F yyyy=O::mul(yy,yy);
    F zz=O::mul(p.z,p.z);
    F s0=O::add(p.x,yy);
    F s=O::sub(O::sub(O::mul(s0,s0),xx),yyyy); s=O::add(s,s);
    F m=O::add(O::add(xx,xx),xx); // a=0 curves
    F x3=O::sub(O::mul(m,m),O::add(s,s));
    F e=O::sub(s,x3);
    F y8=yyyy; for(int i=0;i<3;++i) y8=O::add(y8,y8);
    F y3=O::sub(O::mul(m,e),y8);
    F zy=O::add(p.y,p.z);
    F z3=O::sub(O::sub(O::mul(zy,zy),yy),zz);
    Pt<F> r; r.x=x3;r.y=y3;r.z=z3;r.inf=O::is_zero(z3); return r;
}

template<class F> static Pt<F> pt_add(const Pt<F>&p,const Pt<F>&q){
    using O=FOps<F>;
    if(p.inf) return q;
    if(q.inf) return p;
    F z1z1=O::mul(p.z,p.z), z2z2=O::mul(q.z,q.z);
    F u1=O::mul(p.x,z2z2), u2=O::mul(q.x,z1z1);
    F s1=O::mul(O::mul(p.y,q.z),z2z2), s2=O::mul(O::mul(q.y,p.z),z1z1);
    if(O::eq(u1,u2)){
        if(O::eq(s1,s2)) return pt_dbl(p);
        return pt_identity<F>();
    }
    F h=O::sub(u2,u1);
    F i=O::add(h,h); i=O::mul(i,i);
    F j=O::mul(h,i);
    F rr=O::sub(s2,s1); rr=O::add(rr,rr);
    F v=O::mul(u1,i);
    F x3=O::sub(O::sub(O::mul(rr,rr),j),O::add(v,v));
    F s1j=O::mul(s1,j);
    F y3=O::sub(O::mul(rr,O::sub(v,x3)),O::add(s1j,s1j));
    F zs=O::add(p.z,q.z);
    F z3=O::mul(O::sub(O::sub(O::mul(zs,zs),z1z1),z2z2),h);
    Pt<F> r; r.x=x3;r.y=y3;r.z=z3;r.inf=O::is_zero(z3); return r;
}

// mixed add with affine q (z=1)
template<class F> static Pt<F> pt_add_affine(const Pt<F>&p,const F&qx,const F&qy,bool qinf){
    using O=FOps<F>;
    if(qinf) return p;
    if(p.inf){ Pt<F> r; r.x=qx;r.y=qy;r.z=O::one();r.inf=false; return r; }
    F z1z1=O::mul(p.z,p.z);
    F u2=O::mul(qx,z1z1);
    F s2=O::mul(O::mul(qy,p.z),z1z1);
    if(O::eq(p.x,u2)){
        if(O::eq(p.y,s2)) return pt_dbl(p);
        return pt_identity<F>();
    }
    F h=O::sub(u2,p.x);
    F hh=O::mul(h,h);
    F i=O::add(hh,hh); i=O::add(i,i);
    F j=O::mul(h,i);
    F rr=O::sub(s2,p.y); rr=O::add(rr,rr);
    F v=O::mul(p.x,i);
    F x3=O::sub(O::sub(O::mul(rr,rr),j),O::add(v,v));
    F yj=O::mul(p.y,j);
    F y3=O::sub(O::mul(rr,O::sub(v,x3)),O::add(yj,yj));
    F zh=O::add(p.z,h);
    F z3=O::sub(O::sub(O::mul(zh,zh),z1z1),hh);
    Pt<F> r; r.x=x3;r.y=y3;r.z=z3;r.inf=O::is_zero(z3); return r;
}

template<class F> static void pt_to_affine(const Pt<F>&p,F&ax,F&ay,bool&inf){
    using O=FOps<F>;
    if(p.inf || O::is_zero(p.z)){ inf=true; ax=O::zero(); ay=O::zero(); return; }
    inf=false;
    F zi=O::inv(p.z);
    F zi2=O::mul(zi,zi);
    ax=O::mul(p.x,zi2);
    ay=O::mul(p.y,O::mul(zi2,zi));
}

template<class F> static Pt<F> pt_scalar_mul(const F&ax,const F&ay,bool inf,const U256&k){
    Pt<F> acc=pt_identity<F>();
    if(inf || u256_is_zero(k)) return acc;
    int top=255;
    while(top>=0 && !((k.v[top/64]>>(top%64))&1)) --top;
    for(int i=top;i>=0;--i){
        acc=pt_dbl(acc);
        if((k.v[i/64]>>(i%64))&1) acc=pt_add_affine(acc,ax,ay,false);
    }
    return acc;
}

// Pippenger MSM over affine inputs
template<class F> static Pt<F> pt_msm(const F*xs,const F*ys,const bool*infs,const U256*ks,size_t n){
    if(n==0) return pt_identity<F>();
    int c = 1;
    if(n>=1024) c=11; else if(n>=256) c=9; else if(n>=64) c=7; else if(n>=16) c=5; else c=3;
    int windows = (254 + c - 1)/c;
    size_t nbuckets = ((size_t)1<<c) - 1;
    std::vector<Pt<F>> buckets(nbuckets);
    Pt<F> result=pt_identity<F>();
    for(int w=windows-1;w>=0;--w){
        for(int i=0;i<c;++i) result=pt_dbl(result);
        for(size_t b=0;b<nbuckets;++b) buckets[b]=pt_identity<F>();
        int shift=w*c;
        for(size_t i=0;i<n;++i){
            if(infs[i]) continue;
            int word=shift/64, off=shift%64;
            u64 d = ks[i].v[word] >> off;
            if(off && word<3) d |= ks[i].v[word+1] << (64-off);
            d &= (((u64)1<<c)-1);
            if(d) buckets[d-1]=pt_add_affine(buckets[d-1],xs[i],ys[i],false);
        }
        Pt<F> run=pt_identity<F>(), sum=pt_identity<F>();
        for(size_t b=nbuckets;b-->0;){
            run=pt_add(run,buckets[b]);
            sum=pt_add(sum,run);
        }
        result=pt_add(result,sum);
    }
    return result;
}

// ---------------------------------------------------------------------------
// Pairing (mirrors hekaton_tpu/pairing/host.py: G2 embedded into E(Fq12))
// ---------------------------------------------------------------------------
struct EPt { Fq12 x,y; bool inf; };

static EPt embed_g1(const Fq&x,const Fq&y){
    // Fq12 from base-field scalar: c0.c0.c0 = x (pairing/host.py:26-28)
    EPt r; r.inf=false;
    r.x.c0=fq6_zero(); r.x.c0.c0={x,fq_zero()};
    r.x.c1=fq6_zero();
    r.y.c0=fq6_zero(); r.y.c0.c0={y,fq_zero()};
    r.y.c1=fq6_zero();
    return r;
}
static EPt embed_g2(const Fq2&x,const Fq2&y){
    // x * v (w^2 = v), y * v*w  (pairing/host.py:19-23)
    EPt r; r.inf=false;
    r.x.c0=fq6_zero(); r.x.c0.c1=x; r.x.c1=fq6_zero();
    r.y.c0=fq6_zero(); r.y.c1=fq6_zero(); r.y.c1.c1=y;
    return r;
}

static Fq12 e_line(const EPt&a,const EPt&b,const EPt&p){
    // line through a,b evaluated at p (pairing/host.py:31-48)
    Fq12 lam;
    if(fq12_eq(a.x,b.x) && fq12_eq(a.y,b.y)){
        if(fq12_is_zero(a.y)) return fq12_sub(p.x,a.x);
        Fq12 three; three.c0=fq6_zero(); three.c0.c0={fq_from_u64(3),fq_zero()}; three.c1=fq6_zero();
        Fq12 num=fq12_mul(fq12_sq(a.x),three);
        lam=fq12_mul(num,fq12_inv(fq12_add(a.y,a.y)));
    } else if(fq12_eq(a.x,b.x)){
        return fq12_sub(p.x,a.x);
    } else {
        lam=fq12_mul(fq12_sub(b.y,a.y),fq12_inv(fq12_sub(b.x,a.x)));
    }
    return fq12_sub(fq12_sub(p.y,a.y),fq12_mul(lam,fq12_sub(p.x,a.x)));
}

static EPt e_add(const EPt&a,const EPt&b){
    if(a.inf) return b;
    if(b.inf) return a;
    if(fq12_eq(a.x,b.x)){
        if(fq12_eq(a.y,b.y)){
            if(fq12_is_zero(a.y)){ EPt r; r.inf=true; r.x=fq12_one(); r.y=fq12_one(); return r; }
            Fq12 three; three.c0=fq6_zero(); three.c0.c0={fq_from_u64(3),fq_zero()}; three.c1=fq6_zero();
            Fq12 lam=fq12_mul(fq12_mul(fq12_sq(a.x),three),fq12_inv(fq12_add(a.y,a.y)));
            Fq12 x3=fq12_sub(fq12_sub(fq12_sq(lam),a.x),b.x);
            Fq12 y3=fq12_sub(fq12_mul(lam,fq12_sub(a.x,x3)),a.y);
            EPt r; r.inf=false; r.x=x3; r.y=y3; return r;
        }
        EPt r; r.inf=true; r.x=fq12_one(); r.y=fq12_one(); return r;
    }
    Fq12 lam=fq12_mul(fq12_sub(b.y,a.y),fq12_inv(fq12_sub(b.x,a.x)));
    Fq12 x3=fq12_sub(fq12_sub(fq12_sq(lam),a.x),b.x);
    Fq12 y3=fq12_sub(fq12_mul(lam,fq12_sub(a.x,x3)),a.y);
    EPt r; r.inf=false; r.x=x3; r.y=y3; return r;
}

static void g2_frobenius(const Fq2&x,const Fq2&y,Fq2&ox,Fq2&oy){
    ox=fq2_mul(fq2_conj(x),FROB_V);
    oy=fq2_mul(fq2_mul(fq2_conj(y),FROB_V),FROB_W);
}

static Fq12 miller_loop(const Fq&px,const Fq&py,bool pinf,const Fq2&qx,const Fq2&qy,bool qinf){
    if(pinf||qinf) return fq12_one();
    EPt pe=embed_g1(px,py);
    EPt qe=embed_g2(qx,qy);
    EPt t=qe;
    Fq12 f=fq12_one();
    int top=127; while(top>=0 && !((ATE_LOOP>>top)&1)) --top;
    for(int i=top-1;i>=0;--i){
        f=fq12_mul(fq12_sq(f),e_line(t,t,pe));
        t=e_add(t,t);
        if((ATE_LOOP>>i)&1){
            f=fq12_mul(f,e_line(t,qe,pe));
            t=e_add(t,qe);
        }
    }
    Fq2 q1x,q1y,q2x,q2y;
    g2_frobenius(qx,qy,q1x,q1y);
    g2_frobenius(q1x,q1y,q2x,q2y);
    EPt q1=embed_g2(q1x,q1y);
    EPt q2=embed_g2(q2x,fq2_neg(q2y));
    f=fq12_mul(f,e_line(t,q1,pe));
    t=e_add(t,q1);
    f=fq12_mul(f,e_line(t,q2,pe));
    return f;
}

// hard exponent (p^4 - p^2 + 1)/r: 16 64-bit words, little-endian (computed
// from the BN254 parameters; matches pairing/host.py _HARD_EXP)
static u64 HARD_EXP[16];
static int HARD_EXP_WORDS=0;

static Fq12 final_exponentiation(const Fq12&f){
    // easy part: f^(p^6-1) = conj(f) * f^{-1}; then ^(p^2+1)
    Fq12 t=fq12_mul(fq12_conj(f),fq12_inv(f));
    t=fq12_mul(fq12_frobenius(fq12_frobenius(t)),t);
    return fq12_pow(t,HARD_EXP,HARD_EXP_WORDS);
}

// ---------------------------------------------------------------------------
// byte codecs
// ---------------------------------------------------------------------------
static void read_g1(const uint8_t*b,Fq&x,Fq&y,bool&inf){
    bool allz=true; for(int i=0;i<64;++i) if(b[i]){allz=false;break;}
    inf=allz;
    if(!allz){ x=fq_from_bytes(b); y=fq_from_bytes(b+32); }
    else { x=fq_zero(); y=fq_zero(); }
}
static void write_g1(uint8_t*b,const Fq&x,const Fq&y,bool inf){
    if(inf){ memset(b,0,64); return; }
    fq_to_bytes(x,b); fq_to_bytes(y,b+32);
}
static void read_g2(const uint8_t*b,Fq2&x,Fq2&y,bool&inf){
    bool allz=true; for(int i=0;i<128;++i) if(b[i]){allz=false;break;}
    inf=allz;
    if(!allz){
        x.c0=fq_from_bytes(b); x.c1=fq_from_bytes(b+32);
        y.c0=fq_from_bytes(b+64); y.c1=fq_from_bytes(b+96);
    } else { x=fq2_zero(); y=fq2_zero(); }
}
static void write_g2(uint8_t*b,const Fq2&x,const Fq2&y,bool inf){
    if(inf){ memset(b,0,128); return; }
    fq_to_bytes(x.c0,b); fq_to_bytes(x.c1,b+32);
    fq_to_bytes(y.c0,b+64); fq_to_bytes(y.c1,b+96);
}
static void write_fq12(uint8_t*b,const Fq12&f){
    const Fq6* sixes[2]={&f.c0,&f.c1};
    int off=0;
    for(int h=0;h<2;++h){
        const Fq2* twos[3]={&sixes[h]->c0,&sixes[h]->c1,&sixes[h]->c2};
        for(int i=0;i<3;++i){
            fq_to_bytes(twos[i]->c0,b+off); off+=32;
            fq_to_bytes(twos[i]->c1,b+off); off+=32;
        }
    }
}
static Fq12 read_fq12(const uint8_t*b){
    Fq12 f;
    Fq6* sixes[2]={&f.c0,&f.c1};
    int off=0;
    for(int h=0;h<2;++h){
        Fq2* twos[3]={&sixes[h]->c0,&sixes[h]->c1,&sixes[h]->c2};
        for(int i=0;i<3;++i){
            twos[i]->c0=fq_from_bytes(b+off); off+=32;
            twos[i]->c1=fq_from_bytes(b+off); off+=32;
        }
    }
    return f;
}

// multiply U256 x U256 -> 512-bit (for HARD_EXP computation)
struct U512 { u64 v[8]; };
static U512 u512_zero(){ U512 r; memset(r.v,0,sizeof r.v); return r; }
static U512 u256_mul_wide(const U256&a,const U256&b){
    U512 r=u512_zero();
    for(int i=0;i<4;++i){
        u128 carry=0;
        for(int j=0;j<4;++j){
            u128 cur=(u128)r.v[i+j] + (u128)a.v[i]*b.v[j] + carry;
            r.v[i+j]=(u64)cur; carry=cur>>64;
        }
        r.v[i+4]+=(u64)carry;
    }
    return r;
}

// big unsigned arithmetic on u64 vectors for HARD_EXP = (p^4 - p^2 + 1)/r
static std::vector<u64> bv_mul(const std::vector<u64>&a,const std::vector<u64>&b){
    std::vector<u64> r(a.size()+b.size(),0);
    for(size_t i=0;i<a.size();++i){
        u128 carry=0;
        for(size_t j=0;j<b.size();++j){
            u128 cur=(u128)r[i+j] + (u128)a[i]*b[j] + carry;
            r[i+j]=(u64)cur; carry=cur>>64;
        }
        size_t k=i+b.size();
        while(carry){ u128 cur=(u128)r[k]+carry; r[k]=(u64)cur; carry=cur>>64; ++k; }
    }
    return r;
}
static void bv_sub_inplace(std::vector<u64>&a,const std::vector<u64>&b){
    u128 br=0;
    for(size_t i=0;i<a.size();++i){
        u64 bi = i<b.size()? b[i]:0;
        u128 t=(u128)a[i]-bi-br;
        a[i]=(u64)t; br=(t>>64)?1:0;
    }
}
static void bv_add_small(std::vector<u64>&a,u64 x){
    u128 c=x;
    for(size_t i=0;i<a.size()&&c;++i){ u128 t=(u128)a[i]+c; a[i]=(u64)t; c=t>>64; }
}
static int bv_cmp(const std::vector<u64>&a,const std::vector<u64>&b){
    size_t n=a.size()>b.size()?a.size():b.size();
    for(size_t i=n;i-->0;){
        u64 ai=i<a.size()?a[i]:0, bi=i<b.size()?b[i]:0;
        if(ai<bi) return -1; if(ai>bi) return 1;
    }
    return 0;
}
// long division a / d (d 4 words), quotient into q
static std::vector<u64> bv_div(const std::vector<u64>&a,const U256&d){
    // simple bitwise long division (runs once at init; ~1024 iters)
    std::vector<u64> rem(a.size()+1,0), q(a.size(),0);
    std::vector<u64> dv(d.v,d.v+4);
    int bits=(int)a.size()*64;
    for(int i=bits-1;i>=0;--i){
        // rem <<= 1
        u64 carry=0;
        for(size_t w=0;w<rem.size();++w){ u64 nc=rem[w]>>63; rem[w]=(rem[w]<<1)|carry; carry=nc; }
        rem[0] |= (a[i/64]>>(i%64))&1;
        if(bv_cmp(rem,dv)>=0){ bv_sub_inplace(rem,dv); q[i/64] |= (u64)1<<(i%64); }
    }
    return q;
}

static void init_constants(){
    U256 p,r;
    for(int i=0;i<4;++i){ p.v[i]=P_LIMBS[i]; r.v[i]=R_LIMBS[i]; }
    fp_ctx_init(FQ,p);
    fp_ctx_init(FR,r);
    // FROB_V = xi^((p-1)/3), FROB_W = xi^((p-1)/6)
    Fq2 xi={fq_from_u64(9),fq_one()};
    U256 e3,e6,one=u256_zero(); one.v[0]=1;
    U256 pm1; u256_sub(pm1,p,one);
    // divide by 3 and 6 (exact)
    auto div_small=[&](const U256&x,u64 d){
        U256 q=u256_zero(); u128 rem=0;
        for(int i=3;i>=0;--i){ u128 cur=(rem<<64)|x.v[i]; q.v[i]=(u64)(cur/d); rem=cur%d; }
        return q;
    };
    e3=div_small(pm1,3); e6=div_small(pm1,6);
    FROB_V=fq2_pow(xi,e3);
    FROB_W=fq2_pow(xi,e6);
    // HARD_EXP = (p^4 - p^2 + 1)/r
    std::vector<u64> pv(p.v,p.v+4);
    std::vector<u64> p2=bv_mul(pv,pv);
    std::vector<u64> p4=bv_mul(p2,p2);
    p4.resize(16,0);
    bv_sub_inplace(p4,p2);
    bv_add_small(p4,1);
    std::vector<u64> q=bv_div(p4,r);
    HARD_EXP_WORDS=16;
    for(int i=0;i<16;++i) HARD_EXP[i]= i<(int)q.size()? q[i]:0;
    INITED=true;
}

extern "C" {

int hk_init(){ if(!INITED) init_constants(); return 1; }

// ---- G1 ----
void hk_g1_add(const uint8_t*a,const uint8_t*b,uint8_t*out){
    Fq ax,ay,bx,by; bool ai,bi;
    read_g1(a,ax,ay,ai); read_g1(b,bx,by,bi);
    Pt<Fq> p=pt_identity<Fq>();
    p=pt_add_affine(p,ax,ay,ai);
    p=pt_add_affine(p,bx,by,bi);
    Fq ox,oy; bool oi; pt_to_affine(p,ox,oy,oi);
    write_g1(out,ox,oy,oi);
}
void hk_g1_mul(const uint8_t*a,const uint8_t*k,uint8_t*out){
    Fq ax,ay; bool ai; read_g1(a,ax,ay,ai);
    U256 kk; u256_from_bytes(kk,k);
    Pt<Fq> p=pt_scalar_mul(ax,ay,ai,kk);
    Fq ox,oy; bool oi; pt_to_affine(p,ox,oy,oi);
    write_g1(out,ox,oy,oi);
}
void hk_g1_mul_batch(const uint8_t*pts,const uint8_t*ks,size_t n,uint8_t*out){
    for(size_t i=0;i<n;++i) hk_g1_mul(pts+64*i,ks+32*i,out+64*i);
}
void hk_g1_msm(const uint8_t*pts,const uint8_t*ks,size_t n,uint8_t*out){
    std::vector<Fq> xs(n),ys(n); std::vector<bool> infv(n); std::vector<U256> kk(n);
    std::vector<char> infs(n);
    for(size_t i=0;i<n;++i){
        bool inf; read_g1(pts+64*i,xs[i],ys[i],inf); infs[i]=inf;
        u256_from_bytes(kk[i],ks+32*i);
    }
    std::vector<bool> dummy;
    // need bool* — convert
    std::vector<char>& ic=infs;
    std::vector<unsigned char> tmp(n);
    for(size_t i=0;i<n;++i) tmp[i]=ic[i];
    Pt<Fq> r=pt_msm<Fq>(xs.data(),ys.data(),(const bool*)tmp.data(),kk.data(),n);
    Fq ox,oy; bool oi; pt_to_affine(r,ox,oy,oi);
    write_g1(out,ox,oy,oi);
}

// ---- G2 ----
void hk_g2_add(const uint8_t*a,const uint8_t*b,uint8_t*out){
    Fq2 ax,ay,bx,by; bool ai,bi;
    read_g2(a,ax,ay,ai); read_g2(b,bx,by,bi);
    Pt<Fq2> p=pt_identity<Fq2>();
    p=pt_add_affine(p,ax,ay,ai);
    p=pt_add_affine(p,bx,by,bi);
    Fq2 ox,oy; bool oi; pt_to_affine(p,ox,oy,oi);
    write_g2(out,ox,oy,oi);
}
void hk_g2_mul(const uint8_t*a,const uint8_t*k,uint8_t*out){
    Fq2 ax,ay; bool ai; read_g2(a,ax,ay,ai);
    U256 kk; u256_from_bytes(kk,k);
    Pt<Fq2> p=pt_scalar_mul(ax,ay,ai,kk);
    Fq2 ox,oy; bool oi; pt_to_affine(p,ox,oy,oi);
    write_g2(out,ox,oy,oi);
}
void hk_g2_mul_batch(const uint8_t*pts,const uint8_t*ks,size_t n,uint8_t*out){
    for(size_t i=0;i<n;++i) hk_g2_mul(pts+128*i,ks+32*i,out+128*i);
}
void hk_g2_msm(const uint8_t*pts,const uint8_t*ks,size_t n,uint8_t*out){
    std::vector<Fq2> xs(n),ys(n); std::vector<unsigned char> infs(n); std::vector<U256> kk(n);
    for(size_t i=0;i<n;++i){
        bool inf; read_g2(pts+128*i,xs[i],ys[i],inf); infs[i]=inf;
        u256_from_bytes(kk[i],ks+32*i);
    }
    Pt<Fq2> r=pt_msm<Fq2>(xs.data(),ys.data(),(const bool*)infs.data(),kk.data(),n);
    Fq2 ox,oy; bool oi; pt_to_affine(r,ox,oy,oi);
    write_g2(out,ox,oy,oi);
}

// ---- pairing ----
void hk_multi_pairing(const uint8_t*g1s,const uint8_t*g2s,size_t n,uint8_t*out){
    Fq12 f=fq12_one();
    for(size_t i=0;i<n;++i){
        Fq px,py; bool pi; read_g1(g1s+64*i,px,py,pi);
        Fq2 qx,qy; bool qi; read_g2(g2s+128*i,qx,qy,qi);
        f=fq12_mul(f,miller_loop(px,py,pi,qx,qy,qi));
    }
    write_fq12(out,final_exponentiation(f));
}
void hk_pairing(const uint8_t*g1,const uint8_t*g2,uint8_t*out){
    hk_multi_pairing(g1,g2,1,out);
}
// GT (Fq12) exponentiation: e is 32 bytes LE
void hk_gt_pow(const uint8_t*f,const uint8_t*e,uint8_t*out){
    Fq12 x=read_fq12(f);
    U256 ee; u256_from_bytes(ee,e);
    write_fq12(out,fq12_pow(x,ee.v,4));
}
void hk_gt_mul(const uint8_t*a,const uint8_t*b,uint8_t*out){
    write_fq12(out,fq12_mul(read_fq12(a),read_fq12(b)));
}

// --- debug/bisection helpers (also useful for tests) ---
void hk_miller(const uint8_t*g1,const uint8_t*g2,uint8_t*out){
    Fq px,py; bool pi; read_g1(g1,px,py,pi);
    Fq2 qx,qy; bool qi; read_g2(g2,qx,qy,qi);
    write_fq12(out,miller_loop(px,py,pi,qx,qy,qi));
}
void hk_final_exp(const uint8_t*f,uint8_t*out){
    write_fq12(out,final_exponentiation(read_fq12(f)));
}
void hk_gt_frob(const uint8_t*f,uint8_t*out){
    write_fq12(out,fq12_frobenius(read_fq12(f)));
}
void hk_gt_inv(const uint8_t*f,uint8_t*out){
    write_fq12(out,fq12_inv(read_fq12(f)));
}
// raw-Fq12 line/add (debug): points given as (x,y) Fq12 pairs, never infinity
void hk_dbg_line(const uint8_t*ax,const uint8_t*ay,const uint8_t*bx,const uint8_t*by,
                 const uint8_t*px,const uint8_t*py,uint8_t*out){
    EPt a{read_fq12(ax),read_fq12(ay),false};
    EPt b{read_fq12(bx),read_fq12(by),false};
    EPt p{read_fq12(px),read_fq12(py),false};
    write_fq12(out,e_line(a,b,p));
}
void hk_dbg_eadd(const uint8_t*ax,const uint8_t*ay,const uint8_t*bx,const uint8_t*by,
                 uint8_t*ox,uint8_t*oy,uint8_t*oinf){
    EPt a{read_fq12(ax),read_fq12(ay),false};
    EPt b{read_fq12(bx),read_fq12(by),false};
    EPt r=e_add(a,b);
    write_fq12(ox,r.x); write_fq12(oy,r.y); *oinf = r.inf?1:0;
}

// partial miller loop: run `nhalf` half-iterations (dbl phase / add phase each
// count one), output f and t
void hk_dbg_miller_steps(const uint8_t*g1,const uint8_t*g2,int nhalf,uint8_t*out_f,uint8_t*out_tx,uint8_t*out_ty){
    Fq px,py; bool pi; read_g1(g1,px,py,pi);
    Fq2 qx,qy; bool qi; read_g2(g2,qx,qy,qi);
    EPt pe=embed_g1(px,py);
    EPt qe=embed_g2(qx,qy);
    EPt t=qe;
    Fq12 f=fq12_one();
    int top=127; while(top>=0 && !((ATE_LOOP>>top)&1)) --top;
    int done=0;
    for(int i=top-1;i>=0 && done<nhalf;--i){
        f=fq12_mul(fq12_sq(f),e_line(t,t,pe));
        t=e_add(t,t);
        ++done;
        if(done>=nhalf) break;
        if((ATE_LOOP>>i)&1){
            f=fq12_mul(f,e_line(t,qe,pe));
            t=e_add(t,qe);
            ++done;
        }
    }
    write_fq12(out_f,f);
    write_fq12(out_tx,t.x);
    write_fq12(out_ty,t.y);
}

} // extern "C"
