// Bench the reference gibbon codec on the exact workload graft's
// CodecMicroBench uses (same ts deltas, same quantized sine values).
extern crate gibbon;
use gibbon::{TimeAndValueStream, TimeAndValueIterator, vec_stream::VecWriter, vec_stream::VecReader};
use std::time::Instant;

fn main() {
    let n: usize = 7200;
    let rounds = 200;
    let header: u64 = 1700000000 / 7200 * 7200;
    let mut ts = vec![0u64; n];
    let mut vs = vec![0f64; n];
    let mut t = header;
    for i in 0..n {
        t += 1 + (i as u64 % 3);
        ts[i] = t;
        vs[i] = 20.0 + ((i as f64 / 300.0).sin() * 500.0).round() / 100.0;
    }

    // encode
    let encode = || {
        let mut w = VecWriter::new();
        let mut c = TimeAndValueStream::new(header);
        for i in 0..n {
            c.push(ts[i], vs[i], &mut w);
        }
        w
    };
    for _ in 0..20 { let _ = encode(); }
    let t0 = Instant::now();
    for _ in 0..rounds { let _ = encode(); }
    let dt = t0.elapsed().as_secs_f64();
    let w = encode();
    // exclude the unused tail of the final word (that's what
    // used_bits_last_elm is for) so bytes/point is bit-accurate
    let bits = (w.bit_vector.len() as f64 - 1.0) * 64.0 + w.used_bits_last_elm as f64;
    println!("REF bytes/point  {:.3}", bits / 8.0 / n as f64);
    println!("REF encode  {:8.1} Mpts/s", (n * rounds) as f64 / dt / 1e6);

    // decode
    let decode = |w: &VecWriter| {
        let reader = VecReader::new(&w.bit_vector, w.used_bits_last_elm);
        let it = TimeAndValueIterator::new(reader, header);
        let mut count = 0u64;
        let mut sum = 0f64;
        for p in it {
            let (pt, pv) = p;
            count += pt & 1;
            sum += pv;
        }
        (count, sum)
    };
    for _ in 0..20 { let _ = decode(&w); }
    let t0 = Instant::now();
    for _ in 0..rounds { let _ = decode(&w); }
    let dt = t0.elapsed().as_secs_f64();
    println!("REF decode  {:8.1} Mpts/s", (n * rounds) as f64 / dt / 1e6);
}
