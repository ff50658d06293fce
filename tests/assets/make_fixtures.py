"""Generate the tiny atomic-file fixtures used by the data-pipeline tests.

Run from repo root: python tests/assets/make_fixtures.py
Fixture family:
  toy          — plain transductive dataset (5 users, 8 items, 21 inters)
  toy-ind      — same + is_new column marking inductive-only rows + feature files
  toy-ind_ind  — the inductive eval corpus: benchmark files train/empty/test_filt
                 containing old+new entities (new users u6,u7 / new items i9,i10)
"""
import os

HERE = os.path.dirname(os.path.abspath(__file__))

def w(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")

# ---------------- toy (transductive, no features) ----------------
inter = ["user_id:token\titem_id:token\trating:float\ttimestamp:float"]
rows = [
    ("u1","i1",5,1),("u1","i2",4,2),("u1","i3",3,3),("u1","i4",5,4),
    ("u2","i2",4,5),("u2","i3",2,6),("u2","i5",5,7),("u2","i1",3,8),
    ("u3","i3",5,9),("u3","i6",4,10),("u3","i7",2,11),("u3","i2",4,12),
    ("u4","i4",1,13),("u4","i5",5,14),("u4","i8",4,15),("u4","i6",3,16),
    ("u5","i1",2,17),("u5","i7",5,18),("u5","i8",3,19),("u5","i3",4,20),
    ("u5","i5",1,21),
]
for u,i,r,t in rows:
    inter.append(f"{u}\t{i}\t{r}\t{t}")
w(f"{HERE}/toy/toy.inter", inter)

# item side file (only loaded when load_col includes 'item'): category token
# + a token_seq tags column for the feature-fused sequential models
item = ["item_id:token\tcategory:token\ttags:token_seq"]
for idx in range(1, 9):
    cat = ["a", "b", "c"][idx % 3]
    tags = " ".join(f"t{j}" for j in range(1, (idx % 3) + 2))
    item.append(f"i{idx}\t{cat}\t{tags}")
w(f"{HERE}/toy/toy.item", item)

# preload-weight side table (additional_feat_suffix: [ent]): pretrained
# 8-dim entity vectors keyed by item token, for GRU4RecKG / KSR
ent = ["ent_id:token\tent_vec:float_seq"]
for idx in range(1, 9):
    vec = " ".join(f"{0.1 * idx + 0.01 * j:.3f}" for j in range(8))
    ent.append(f"i{idx}\t{vec}")
w(f"{HERE}/toy/toy.ent", ent)

# ---------------- toy-ind (train corpus with is_new + features) ----------------
inter = ["user_id:token\titem_id:token\trating:float\ttimestamp:float\tis_new:token"]
for u,i,r,t in rows:
    inter.append(f"{u}\t{i}\t{r}\t{t}\t-1")
# inductive-only rows (new user u6 / new item i9) — dropped in transductive phase
inter += ["u6\ti1\t4\t22\t1", "u1\ti9\t5\t23\t1", "u6\ti9\t3\t24\t1"]
w(f"{HERE}/toy-ind/toy-ind.inter", inter)

user = ["user_id:token\tage:float\tgender:token"]
for idx, u in enumerate(["u1","u2","u3","u4","u5","u6"]):
    user.append(f"{u}\t{20+idx}\t{'M' if idx%2==0 else 'F'}")
w(f"{HERE}/toy-ind/toy-ind.user", user)

item = ["item_id:token\tprice:float\tcategory:token"]
cats = ["a","b","a","c","b","a","c","b","c","a"]
for idx, i in enumerate(["i1","i2","i3","i4","i5","i6","i7","i8","i9","i10"]):
    item.append(f"{i}\t{float(idx+1)}\t{cats[idx]}")
w(f"{HERE}/toy-ind/toy-ind.item", item)

# ---------------- toy-ind_ind (inductive eval corpus, benchmark files) -------
# 'train' = the transductive interactions (old entities first => old ids < new ids)
train = ["user_id:token\titem_id:token\trating:float\ttimestamp:float"]
for u,i,r,t in rows:
    train.append(f"{u}\t{i}\t{r}\t{t}")
w(f"{HERE}/toy-ind_ind/toy-ind_ind.train.inter", train)
w(f"{HERE}/toy-ind_ind/toy-ind_ind.empty.inter",
  ["user_id:token\titem_id:token\trating:float\ttimestamp:float"])
test = ["user_id:token\titem_id:token\trating:float\ttimestamp:float"]
# held-out rows: old-old, new-user, new-item, new-new
test += ["u1\ti5\t4\t30", "u6\ti1\t4\t31", "u6\ti3\t5\t32",
         "u2\ti9\t4\t33", "u7\ti10\t5\t34", "u7\ti2\t3\t35"]
w(f"{HERE}/toy-ind_ind/toy-ind_ind.test_filt.inter", test)

# user/item files for the _ind corpus (all entities incl. u7/i10; old first)
user = ["user_id:token\tage:float\tgender:token"]
for idx, u in enumerate(["u1","u2","u3","u4","u5","u6","u7"]):
    user.append(f"{u}\t{20+idx}\t{'M' if idx%2==0 else 'F'}")
w(f"{HERE}/toy-ind_ind/toy-ind_ind.user", user)
item = ["item_id:token\tprice:float\tcategory:token"]
for idx, i in enumerate(["i1","i2","i3","i4","i5","i6","i7","i8","i9","i10"]):
    item.append(f"{i}\t{float(idx+1)}\t{cats[idx]}")
w(f"{HERE}/toy-ind_ind/toy-ind_ind.item", item)

print("fixtures written under", HERE)

# ---------------- toy-kg (knowledge graph fixture) ----------------
import shutil
shutil.copy(f"{HERE}/toy/toy.inter", f"{HERE}/toy-kg/toy-kg.inter") if os.path.isdir(f"{HERE}/toy-kg") or os.makedirs(f"{HERE}/toy-kg", exist_ok=True) is None else None
kg = ["head_id:token\trelation_id:token\ttail_id:token"]
kg += ["e1\tdirected_by\te20", "e2\tdirected_by\te20", "e3\tstarring\te21",
       "e4\tstarring\te21", "e5\tdirected_by\te22", "e20\tborn_in\te23",
       "e21\tborn_in\te23", "e6\tstarring\te22"]
w(f"{HERE}/toy-kg/toy-kg.kg", kg)
link = ["item_id:token\tentity_id:token"]
for idx in range(1, 9):
    link.append(f"i{idx}\te{idx}")
w(f"{HERE}/toy-kg/toy-kg.link", link)
print("kg fixture written")
